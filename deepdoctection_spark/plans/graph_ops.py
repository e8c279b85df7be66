"""Registration: join-based PageRank with an unrolled-CTE DuckDB oracle.

The oracle replays the exact integer power iteration (operators/graph.py's
determinism contract) as a programmatically generated CTE chain — the same
iterative-argmax oracle technique as training_ops' Lloyd rounds and
corpusprep's unrolled BPE trainer."""

from __future__ import annotations

from deepdoctection_spark.operators.graph import (
    BFS_MAX_DEPTH,
    CC_BLOCK,
    DAMP_DEN,
    DAMP_NUM,
    HITS_ITERS,
    HITS_SCALE,
    PR_ITERS,
    PR_SCALE,
    bfs_levels,
    block_components,
    hits,
    pagerank,
    triangles,
)
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.plans.training_ops import _docs

_EDGES_CTE = """
nodes AS (SELECT doc_id::BIGINT AS node FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
edges AS (SELECT node AS src, (node % 3 + 1)::BIGINT AS outdeg,
          (node * 7 + k) % nn.n AS dst
          FROM nodes, nn, unnest(range(1, (node % 3 + 2)::BIGINT)) AS t(k))
"""


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


def _hits_oracle(iters: int = HITS_ITERS) -> str:
    rounds = []
    for i in range(1, iters + 1):
        prev = f"h{i - 1}"
        rounds.append(f"""
ai{i} AS (SELECT dst, sum(h)::BIGINT AS s FROM edges
          JOIN {prev} ON {prev}.node = edges.src GROUP BY dst),
a{i} AS (SELECT nodes.node, coalesce(ai{i}.s, 0)::BIGINT AS a
         FROM nodes LEFT JOIN ai{i} ON ai{i}.dst = nodes.node),
hi{i} AS (SELECT src, sum(a)::BIGINT AS s FROM edges
          JOIN a{i} ON a{i}.node = edges.dst GROUP BY src),
h{i} AS (SELECT nodes.node, coalesce(hi{i}.s, 0)::BIGINT AS h
         FROM nodes LEFT JOIN hi{i} ON hi{i}.src = nodes.node)""")
    chain = ",".join(rounds)
    return f"""
WITH {_EDGES_CTE},
h0 AS (SELECT node, {HITS_SCALE}::BIGINT AS h FROM nodes),
{chain}
SELECT h{iters}.node AS doc_id, h{iters}.h AS hub, a{iters}.a AS auth
FROM h{iters} JOIN a{iters} ON a{iters}.node = h{iters}.node
"""


@register("graph_hits", _hits_oracle())
def q_graph_hits(spark, sf_dir):
    """Integer HITS hubs/authorities after 3 fixed unnormalized rounds over
    the same deterministic link graph; BIGINT sums make the scores
    aggregation-order independent and bit-identical across engines."""
    return hits(_docs(spark, sf_dir))


@register(
    "graph_components",
    f"""
SELECT doc_id::BIGINT AS doc_id,
       ((doc_id // {CC_BLOCK}) * {CC_BLOCK})::BIGINT AS component
FROM documents
""",
)
def q_graph_components(spark, sf_dir):
    """Connected components of the block-path graph by bounded min-label
    propagation; the oracle is the closed-form component minimum
    block·(v div block) the propagation must converge to."""
    return block_components(_docs(spark, sf_dir))


@register(
    "graph_triangles",
    """
WITH nodes AS (SELECT doc_id::BIGINT AS v FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
raw AS (
  SELECT v, (v + 1) % nn.n AS d FROM nodes, nn
  UNION ALL SELECT v, (v + 2) % nn.n FROM nodes, nn
  UNION ALL SELECT v, (v + 4) % nn.n FROM nodes, nn WHERE v % 5 < 2),
edges AS (SELECT DISTINCT least(v, d) AS a, greatest(v, d) AS b
          FROM raw WHERE v <> d),
tris AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM edges e1
         JOIN edges e2 ON e2.a = e1.b
         JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node AS doc_id, count(*)::BIGINT AS n_tri
FROM (SELECT x AS node FROM tris
      UNION ALL SELECT y FROM tris
      UNION ALL SELECT z FROM tris)
GROUP BY node
""",
)
def q_graph_triangles(spark, sf_dir):
    """Per-node triangle counts via the canonical oriented two-join plan
    over the deterministic circulant-plus-chord graph."""
    return triangles(_docs(spark, sf_dir))


@register(
    "graph_bfs_levels",
    f"""
WITH RECURSIVE {_EDGES_CTE},
walk AS (
  SELECT 0::BIGINT AS node, 0 AS lvl
  UNION
  SELECT e.dst, w.lvl + 1 FROM walk w
  JOIN edges e ON e.src = w.node WHERE w.lvl < {BFS_MAX_DEPTH}
)
SELECT node AS doc_id, min(lvl)::INT AS lvl FROM walk GROUP BY node
""",
)
def q_graph_bfs_levels(spark, sf_dir):
    """Single-source BFS levels (source doc_id 0) over the directed link
    graph; frontier iteration in Spark vs a depth-capped recursive-CTE
    min-level replay in DuckDB."""
    return bfs_levels(_docs(spark, sf_dir))
