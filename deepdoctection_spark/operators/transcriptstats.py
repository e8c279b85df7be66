"""Agent-transcript analytics over the north-rule input table
(conv_id, turn_idx, role, text, tool, ts): per-conversation tool-usage and
latency rollups, and corpus-wide role-transition statistics.

These are the observability queries a production agent-transcript pipeline
runs alongside extraction (reference analogue: the dataset summarizer /
label-histogram surface, /root/reference/deepdoctection/datasets/info.py and
eval/accmetric.py's confusion tabulations — re-aimed at the transcript
schema itself rather than annotation categories).

Determinism contract: per-turn latency is PLANTED deterministically from
(conv_id, turn_idx) via the md5 hex-prefix idiom (the corpus carries a
constant 30 s ts cadence by construction, so a hash-derived latency is what
makes the rollups non-trivial); every aggregate is exact integer math, and
ordered sequences are assembled with array_sort over (turn_idx, ·) structs —
no window, no nondeterministic collect order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LATENCY_MOD = 10000
ROLE_START = "<start>"


def planted_latency_ms(conv_id: Column, turn_idx: Column) -> Column:
    """Deterministic per-turn latency in ms: first 8 md5 hex chars of
    'lat#<conv>#<turn>' as a bigint, mod 10000 (engine-portable: DuckDB
    reproduces it with ('0x'||substr(md5(..),1,8))::BIGINT % 10000)."""
    key = F.concat(F.lit("lat#"), conv_id, F.lit("#"), turn_idx.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % LATENCY_MOD


def conv_tool_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation rollup: turn counts by role, tool-call counts, the
    ordered tool-call sequence, planted-latency totals, and the wall-clock
    span from ts. ONE hash aggregation keyed conv_id — map-side partial
    combine does most of the work; the ordered tool sequence costs an
    array_sort of an already-grouped list, never a sort-shuffle."""
    t = transcripts.withColumn(
        "latency_ms", planted_latency_ms(F.col("conv_id"), F.col("turn_idx"))
    )
    tool_struct = F.when(
        F.col("tool") != "", F.struct("turn_idx", "tool")
    )  # null (skipped by collect_list) for non-tool turns
    return t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long")
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.when(F.col("tool") != "", 1).otherwise(0))
        .cast("long")
        .alias("n_tool_calls"),
        F.size(
            F.array_distinct(
                F.transform(
                    F.array_sort(F.collect_list(tool_struct)), lambda s: s["tool"]
                )
            )
        )
        .cast("int")
        .alias("n_distinct_tools"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(tool_struct)), lambda s: s["tool"]
            ),
            ",",
        ).alias("tool_seq"),
        F.sum("latency_ms").cast("long").alias("sum_latency_ms"),
        F.max("latency_ms").cast("long").alias("max_latency_ms"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("long")
        .alias("span_sec"),
    )


def role_bigrams(transcripts: DataFrame) -> DataFrame:
    """Corpus-wide role-transition matrix: (prev_role → role) counts with a
    '<start>' pseudo-role for each conversation's first turn — the Markov
    view of agent-loop structure (user→assistant→tool cycles, retry runs).

    Scale shape: the lag window partitions BY conv_id (parallel, bounded
    groups — never a global sort), then a 9-ish-row hash agg with map-side
    combine; output is O(|roles|²) regardless of corpus size."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = transcripts.select(
        F.lag("role", 1, ROLE_START).over(w).alias("prev_role"), "role"
    )
    return pairs.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
