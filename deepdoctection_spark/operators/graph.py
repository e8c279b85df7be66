"""Join-based PageRank over a document link graph.

The graph-analytics counterpart of the near-dup cluster formation in
operators/dedupclusters.py (bounded min-label propagation): here the
iterative kernel is the power iteration r' = (1-d)/N + d·Σ_in r/outdeg,
expressed as DataFrame algebra — one equi-join (edge.src → rank) plus one
hash aggregation (group by dst) per iteration, the textbook
"PageRank on a relational engine" plan. At web scale the edge table is
partitioned by src so each iteration's join co-locates with the rank table's
partitioning; the per-iteration shuffle is the aggregation on dst only.

Determinism contract: ranks live as INTEGER nano-units (the initial mass is
SCALE = 1e9 split evenly, integer floor), per-edge contributions are integer
floor-divisions rank//outdeg, and the damping step is integer
(15·SCALE)//(100·N) + (85·Σ)//100 — no float anywhere, so Spark and the
unrolled-CTE DuckDB oracle agree bit-for-bit and the result is independent
of aggregation order. The floor-division mass leakage (< N·outdeg units per
iteration, i.e. < 1e-3 of total mass here) is part of the operator's defined
semantics, exactly like the integer micro-bit contracts in
corpusprep.bigram_perplexity.

The edge list is derived deterministically from the documents table (both
engines build the same graph): node doc_id links to (7·doc_id + k) mod N for
k = 1..(1 + doc_id mod 3) — out-degree 1-3, every node reachable (7 ⊥ N
shift makes the k=1 edges a bijection), no dangling nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000
PR_ITERS = 5
DAMP_NUM, DAMP_DEN = 85, 100


def _edges(docs: DataFrame) -> DataFrame:
    """Deterministic 1-3-out-regular edge list over the doc_id node set."""
    n = docs.select(F.count("*").cast("long").alias("n"))
    base = docs.select(F.col("doc_id").cast("long").alias("src")).crossJoin(
        F.broadcast(n)
    )
    ks = F.sequence(F.lit(1), (F.col("src") % 3 + 1).cast("int"))
    return base.select(
        "src",
        "n",
        (F.col("src") % 3 + 1).cast("long").alias("outdeg"),
        F.explode(ks).alias("k"),
    ).select(
        "src",
        "outdeg",
        ((F.col("src") * 7 + F.col("k")) % F.col("n")).alias("dst"),
    )


def pagerank(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer-nano-unit PageRank after ``iters`` power iterations.

    The driver loop is over a model-scalar iteration count; each round is
    entirely distributed (join + agg). localCheckpoint every round keeps the
    lineage flat — same discipline as dedupclusters' label propagation."""
    edges = _edges(docs).persist()
    n_nodes = docs.count()
    init = (
        docs.select(F.col("doc_id").cast("long").alias("node"))
        .withColumn("r", F.lit(PR_SCALE // n_nodes).cast("long"))
    )
    teleport = (15 * PR_SCALE) // (100 * n_nodes)
    ranks = init
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select("dst", F.expr("r DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            init.select("node")
            .join(contrib, init["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(inflow, CAST(0 AS BIGINT)))"
                        f" DIV {DAMP_DEN}"
                    )
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    edges.unpersist()
    return ranks.select(F.col("node").alias("doc_id"), F.col("r").alias("pr_nano"))
