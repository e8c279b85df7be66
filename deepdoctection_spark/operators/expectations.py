"""Data-validation expectations over transcript tables (the Deequ-style
pre-flight a production ingest runs before and after every stage).

One violation-count row per rule, computed from a handful of BOUNDED
aggregations (plain conditional sums fuse into ONE pass; uniqueness and
contiguity are conv-keyed hash aggs; monotonicity one conv_id window) —
output size is O(#rules), independent of corpus size, so the report is a
free side-output at any scale.

Reference analogue: the dataflow sanity layer (dataflow/serialize.py's
schema assertions + datasets/info.py summaries) promoted to a first-class,
oracle-checkable relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROLES = ("user", "assistant", "tool")


def transcript_expectations(transcripts: DataFrame) -> DataFrame:
    """Violation report over the transcript contract:

    - conv_id_not_null / turn_idx_nonnegative / role_in_domain /
      text_not_null: row-level conditional sums (one fused pass)
    - turn_unique: duplicate (conv_id, turn_idx) rows beyond the first
    - turn_idx_contiguous: conversations whose turn_idx set is not exactly
      0..n-1 (counts CONVERSATIONS, not rows)
    - ts_monotone_nondecreasing: rows whose ts precedes the previous
      DISTINCT turn's ts in turn_idx order

    Returns (rule, n_violations, passed), one row per rule.
    """
    t = transcripts
    row_rules = {
        "conv_id_not_null": F.col("conv_id").isNull(),
        "turn_idx_nonnegative": F.col("turn_idx") < 0,
        "role_in_domain": ~F.col("role").isin(*ROLES),
        "text_not_null": F.col("text").isNull(),
    }
    row_counts = t.agg(
        *[
            F.sum(pred.cast("long")).alias(name)
            for name, pred in row_rules.items()
        ]
    )

    dup = (
        t.groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("turn_unique"))
    )

    contig = (
        t.groupBy("conv_id")
        .agg(
            F.countDistinct("turn_idx").alias("nd"),
            F.max("turn_idx").alias("mx"),
            F.min("turn_idx").alias("mn"),
        )
        .agg(
            F.sum(
                ((F.col("mn") != 0) | (F.col("mx") != F.col("nd") - 1))
                .cast("long")
            ).alias("turn_idx_contiguous")
        )
    )

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    mono = (
        t.select("conv_id", "turn_idx", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .agg(
            F.sum((F.col("ts") < F.col("prev_ts")).cast("long"))
            .alias("ts_monotone_nondecreasing")
        )
    )

    wide = (
        row_counts.crossJoin(dup).crossJoin(contig).crossJoin(mono)
    )  # four 1-row relations — the cross joins are scalar combines
    names = list(row_rules) + [
        "turn_unique", "turn_idx_contiguous", "ts_monotone_nondecreasing",
    ]
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("rule"),
                        F.coalesce(F.col(n), F.lit(0))
                        .cast("long").alias("n_violations"),
                    )
                    for n in names
                ]
            )
        ).alias("r")
    )
    return stacked.select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_violations").alias("n_violations"),
        (F.col("r.n_violations") == 0).alias("passed"),
    )
