"""Registration: join-based PageRank with an unrolled-CTE DuckDB oracle.

The oracle replays the exact integer power iteration (operators/graph.py's
determinism contract) as a programmatically generated CTE chain — the same
iterative-argmax oracle technique as training_ops' Lloyd rounds and
corpusprep's unrolled BPE trainer."""

from __future__ import annotations

from deepdoctection_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    PR_ITERS,
    PR_SCALE,
    pagerank,
)
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.plans.training_ops import _docs


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    rounds = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        rounds.append(f"""
c{i} AS (SELECT dst, sum(r // outdeg)::BIGINT AS inflow
         FROM edges JOIN {prev} ON {prev}.node = edges.src GROUP BY dst),
r{i} AS (SELECT nodes.node,
         ((15::BIGINT * {PR_SCALE}) // (100 * nn.n)
          + ({DAMP_NUM} * coalesce(c{i}.inflow, 0)) // {DAMP_DEN})::BIGINT AS r
         FROM nodes CROSS JOIN nn
         LEFT JOIN c{i} ON c{i}.dst = nodes.node)""")
    chain = ",".join(rounds)
    return f"""
WITH nodes AS (SELECT doc_id::BIGINT AS node FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
edges AS (SELECT node AS src, (node % 3 + 1)::BIGINT AS outdeg,
          (node * 7 + k) % nn.n AS dst
          FROM nodes, nn, unnest(range(1, (node % 3 + 2)::BIGINT)) AS t(k)),
r0 AS (SELECT node, ({PR_SCALE} // nn.n)::BIGINT AS r FROM nodes, nn),
{chain}
SELECT node AS doc_id, r AS pr_nano FROM r{iters}
"""


@register("graph_pagerank", _pagerank_oracle())
def q_graph_pagerank(spark, sf_dir):
    """PageRank (5 integer power iterations, damping 0.85) over the
    deterministic 1-3-out-regular doc_id link graph; ranks in exact integer
    nano-units so every engine agrees bit-for-bit."""
    return pagerank(_docs(spark, sf_dir))
