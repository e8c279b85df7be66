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


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       sensitive_col: str, k: int = 5) -> DataFrame:
    """k-anonymity / l-diversity audit over a release candidate: one row per
    quasi-identifier equivalence class with its size (``class_n``), the
    number of distinct sensitive values it hides (``l_div``), and an
    ``at_risk`` flag for classes smaller than ``k`` — the rows an attacker
    who knows the quasi-identifiers can pin to ≤k-1 candidates (Sweeney
    2002; Machanavajjhala et al. 2006 for l-diversity).

    A corpus-release gate runs this before publishing any table that pairs
    demographic-ish columns with payloads. Plan shape: ONE hash aggregation
    keyed by the quasi-identifier tuple (map-side combined; distinct
    sensitive values via the same agg) — output is O(|distinct QI tuples|),
    independent of row count, so the audit is a free side-pass at any
    scale. Skewed classes are irrelevant: the agg's combiner collapses each
    class partition-locally.

    Reference analogue: the dataflow sanity layer (datasets/info.py
    summaries) — this is its privacy-risk counterpart.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count("*").cast("long").alias("class_n"),
            F.count_distinct(sensitive_col).cast("long").alias("l_div"),
        )
        .withColumn("at_risk", (F.col("class_n") < k).cast("int"))
    )
