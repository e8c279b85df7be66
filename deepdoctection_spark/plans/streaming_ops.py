"""Streaming queries surfaced on the driver contract.

Each query materializes a BOUNDED run of the Structured Streaming pipeline
(file-arrival source over a freshly-written transcript directory →
trigger(availableNow) → memory sink) and returns the sink table — so the
driver's correctness gate checks the actual streaming execution path, not a
batch stand-in.

- stream_extract_text HAS a full DuckDB oracle: the streaming extraction of
  the whole table must hash-match the template ground truth exactly like the
  batch extract_text query (ONE code path, two execution modes — the
  engine's core streaming claim, now oracle-verified).
- stream_session_assembly has no SQL equivalent (applyInPandasWithState with
  event-time timeouts) → registered without an oracle; the driver records
  the weaker rows-only check, and tests/test_streaming.py carries the strong
  semantics checks (batch-cut independence).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from deepdoctection_spark.plans import oracles
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.sources.transcripts import build_transcripts
from deepdoctection_spark.streaming import stream_extract, stream_transcripts


def _bounded_stream_run(
    spark: SparkSession, sf_dir: str, stage_fn, complete: bool = False
) -> DataFrame:
    """Write transcripts as a multi-file dir, run `stage_fn(stream_df)` to a
    memory sink with availableNow, return the sink table. ``complete``
    selects complete output mode (whole-result aggregations: append would
    correctly hold back windows the watermark hasn't closed)."""
    path = tempfile.mkdtemp(prefix="ddspark_stream_q_")
    build_transcripts(spark, sf_dir).repartition(4).write.mode(
        "overwrite"
    ).parquet(path)
    name = f"stream_q_{uuid.uuid4().hex[:8]}"
    q = (
        stage_fn(stream_transcripts(spark, path))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(name)


@register("stream_extract_text", oracles.oracle_extract_text())
def q_stream_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bounded_stream_run(spark, sf_dir, stream_extract).select(
        "conv_id", "turn_idx", "role", "tool", "extracted_text", "n_blocks"
    )


def _oracle_stream_reassemble() -> str:
    """Per (conv_id, 1-hour event window): ordered turn concat — the
    windowed-aggregation face of the conversation_text oracle (ts is a pure
    function of doc_id: epoch + doc_id·30s)."""
    from deepdoctection_spark.plans.oracles import _extracted_text_case
    from deepdoctection_spark.sources.transcripts import (
        EPOCH_2024,
        TRANSCRIPT_BASE_SQL,
    )

    return f"""
WITH base AS ({TRANSCRIPT_BASE_SQL}),
et AS (
  SELECT conv_id, turn_idx, {_extracted_text_case()} AS t,
         ({EPOCH_2024} + doc_id * 30) AS tsec
  FROM base
)
SELECT conv_id,
       ((tsec // 3600) * 3600 * 1000000)::BIGINT AS window_start_us,
       count(*)::BIGINT AS n_turns,
       string_agg(t, chr(10) || chr(10) ORDER BY turn_idx) AS conv_text
FROM et GROUP BY conv_id, tsec // 3600
"""


@register("stream_reassemble_windows", _oracle_stream_reassemble())
def q_stream_reassemble_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed conversation reassembly (complete mode → every
    event-time window emitted), oracle-checked against the template ground
    truth — the watermark+window aggregation path itself, not a batch
    stand-in."""
    from pyspark.sql import functions as F

    from deepdoctection_spark.streaming import stream_reassemble

    out = _bounded_stream_run(
        spark,
        sf_dir,
        lambda s: stream_reassemble(s, window="1 hour"),
        complete=True,
    )
    return out.select(
        "conv_id",
        F.unix_micros("window_start").alias("window_start_us"),
        "n_turns",
        "conv_text",
    )


@register("stream_session_assembly")  # no oracle: stateful, non-SQL-expressible
def q_stream_session_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoctection_spark.streaming.sessionize import sessionize_conversations

    def stage(stream_df):
        return sessionize_conversations(
            stream_extract(stream_df, with_words=False), gap_seconds=300
        )

    return _bounded_stream_run(spark, sf_dir, stage)
