"""Bucketed-table layout: shuffle-free conversation operations at rest.

SURVEY.md §4 names conv_id-hash bucketing as the explicit partitioning
design; this module is the write/read path. Writing the extraction output
as a table bucketed by conv_id means every later conversation-grained
operation — reassembly, per-conv stats, conv-to-conv joins between runs —
reads data already hash-distributed on the key: Catalyst elides the
Exchange entirely (verified in tests/test_bucketing.py on the physical
plan). At 100 TB this converts the one shuffle the engine has into a
one-time cost paid at write, amortized over every downstream query.

The reference has no storage layout concept at all — its closest analogue
is re-reading per-document JSON dumps (image.py:635-674); bucket-aware
scans are pure Spark capability surfaced through the engine's API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deepdoctection_spark.operators.reassembly import reassemble_conversations


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 16,
    bucket_col: str = "conv_id",
    sort_col: str = "turn_idx",
) -> None:
    """Persist as a conv-bucketed, turn-sorted managed table.

    bucketBy pins the hash distribution into the file layout; sortBy keeps
    turns ordered within each bucket file so conversation scans are
    sequential reads."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def reassemble_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Conversation reassembly over a bucketed extraction table — the same
    aggregation as operators/reassembly.reassemble_conversations, but the
    bucketed layout satisfies the hash requirement so the plan contains NO
    Exchange (the scan itself is the distribution)."""
    return reassemble_conversations(read_bucketed(spark, table))
