"""Ranking-quality metrics: recall@k, MRR@k and nDCG@k of a system ranking
against an exact ground-truth ranking — the evaluation loop for every ANN /
retrieval operator in this engine (IVF, PQ-ADC, hyperplane LSH vs exact
kNN).

All three metrics are integer micro-units end-to-end so results are
bit-identical across engines and aggregation orders (the same discipline as
the eval/P-R-F1 and perplexity operators): position discounts come from a
PRECOMPUTED integer table floor(1e6 / log2(i+1)) — no float log in either
engine — and every ratio is floor(numerator·1e6 / denominator) with
operands far below 2^53.

Reference analogue: the evaluator surface (eval/accmetric.py) generalized
from classification agreement to ranked-retrieval agreement.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def dcg_weights(k: int) -> list[int]:
    """floor(1e6 / log2(i+1)) for positions i = 1..k — embedded verbatim in
    the DuckDB oracle so no engine evaluates a float log."""
    return [int(MICRO / math.log2(i + 1)) for i in range(1, k + 1)]


def rank_metrics(system: DataFrame, truth: DataFrame, k: int) -> DataFrame:
    """Per-query ranking quality of ``system`` vs ``truth`` (both
    (query_id, vec_id, rank) relations with ranks 1..k; truth defines the
    relevant set — exactly k relevant items per query).

    Returns (query_id, n_hits, recall_micro, mrr_micro, ndcg_micro):
    recall@k·1e6, 1e6/rank-of-first-relevant (0 when none), and
    nDCG@k·1e6 with the integer discount table. One equi-join + one hash
    agg per query — both sides are top-k relations, so the whole plan is
    O(queries · k) regardless of corpus size.
    """
    w = dcg_weights(k)
    weight = F.element_at(F.array(*[F.lit(x) for x in w]), F.col("rank"))
    idcg = sum(w)
    rel = truth.select("query_id", "vec_id")
    hits = system.join(rel, ["query_id", "vec_id"]).select(
        "query_id", "rank", weight.alias("wt")
    )
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("rank").alias("first_rank"),
        F.sum("wt").cast("long").alias("dcg"),
    )
    return (
        truth.select("query_id").distinct()
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.floor(
                F.coalesce(F.col("n_hits"), F.lit(0)) * MICRO / F.lit(k)
            ).cast("long").alias("recall_micro"),
            F.coalesce(
                F.floor(F.lit(MICRO) / F.col("first_rank")), F.lit(0)
            ).cast("long").alias("mrr_micro"),
            F.floor(
                F.coalesce(F.col("dcg"), F.lit(0)) * MICRO / F.lit(idcg)
            ).cast("long").alias("ndcg_micro"),
        )
    )
