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

# planted tool palette for chain/retry analytics — the synthetic corpus's own
# tool column strictly alternates (browser/pdf_reader by doc_id % 3), which
# makes chain mining degenerate; queries that need realistic variety remap
# tool-capable turns onto this palette with the md5 hex-prefix idiom
PLANTED_TOOLS = ["search", "browser", "python", "bash"]


def with_planted_tools(transcripts: DataFrame) -> DataFrame:
    """Remap each tool-capable turn's tool to a deterministic pick from
    PLANTED_TOOLS keyed on (conv_id, turn_idx) — engine-portable: DuckDB
    reproduces it with ('0x'||substr(md5('tool#'||conv_id||'#'||turn_idx),
    1,4))::INT % 4 + 1 list indexing. Non-tool turns keep tool=''."""
    key = F.concat(
        F.lit("tool#"), F.col("conv_id"), F.lit("#"),
        F.col("turn_idx").cast("string"),
    )
    pick = (F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int")
            % len(PLANTED_TOOLS)) + 1
    palette = F.array(*[F.lit(t) for t in PLANTED_TOOLS])
    return transcripts.withColumn(
        "tool",
        F.when(F.col("tool") != "", F.element_at(palette, pick)).otherwise(""),
    )


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


def tool_chain_ngrams(transcripts: DataFrame, n: int = 3) -> DataFrame:
    """Frequent tool-call chains: corpus-wide counts of length-``n``
    sliding windows over each conversation's ordered tool sequence — the
    'which tool pipelines do agents actually run' view that drives both
    prompt-engineering and tool-routing decisions at fleet scale.

    Plan shape: ONE conv_id hash agg builds the per-conversation ordered
    tool array (array_sort of grouped structs — no sort-shuffle), n-grams
    are formed IN-ROW with sequence+transform+slice (zero extra shuffle,
    fan-out bounded by turns-per-conversation), then one small hash agg on
    the chain key. Output is O(|distinct chains|), independent of corpus
    size. Reference analogue: the dataset summarizer / label-histogram
    surface (datasets/info.py) re-aimed at tool-call sequences.

    Returns (chain, n_occurrences, n_convs): total sliding-window hits and
    the distinct-conversation support, chain as 'a>b>c'.
    """
    tool_struct = F.when(F.col("tool") != "", F.struct("turn_idx", "tool"))
    seqs = transcripts.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(tool_struct)), lambda s: s["tool"]
        ).alias("tools")
    )
    grams = (
        seqs.where(F.size("tools") >= n)
        .select(
            "conv_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tools") - n + 1),
                    lambda i: F.array_join(F.slice(F.col("tools"), i, n), ">"),
                )
            ).alias("chain"),
        )
    )
    return grams.groupBy("chain").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
    )


def tool_retry_runs(transcripts: DataFrame, min_len: int = 2) -> DataFrame:
    """Retry-loop detection (gaps-and-islands): maximal runs of the SAME
    tool called on consecutive tool turns of a conversation — the signal a
    transcript-quality pipeline uses to flag thrashing agents (a tool
    failing repeatedly) before the data reaches training.

    Plan shape: tool turns only → per-conversation lag to mark run starts →
    running sum assigns island ids → one hash agg per (conv_id, island).
    Both windows partition BY conv_id (bounded groups, parallel across the
    corpus — never a global sort); everything after the first shuffle is
    map-side local.

    Returns (conv_id, tool, run_len, start_turn, end_turn) for runs with
    run_len >= min_len, one row per maximal run.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tool_turns = transcripts.where(F.col("tool") != "").select(
        "conv_id", "turn_idx", "tool"
    )
    marked = tool_turns.withColumn(
        "is_start",
        F.when(F.lag("tool", 1).over(w) == F.col("tool"), 0).otherwise(1),
    ).withColumn(
        "island",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy("conv_id", "island", "tool")
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("turn_idx").cast("int").alias("start_turn"),
            F.max("turn_idx").cast("int").alias("end_turn"),
        )
        .where(F.col("run_len") >= min_len)
        .select("conv_id", "tool", "run_len", "start_turn", "end_turn")
    )


def response_latency(transcripts: DataFrame) -> DataFrame:
    """Assistant response-latency rollup — the first SLO an agent-platform
    dashboard wants: for every user→assistant adjacency (the reply edge; a
    tool turn between them means the reply was mediated and is NOT counted
    here) the ts delta, aggregated per conversation to exchange count and
    exact integer latency stats (sum/max seconds, mean in milli-seconds by
    integer division — no float drift).

    One conv_id-partitioned lag window (bounded per-conversation groups,
    the transcript suite's standard shuffle) + one conv-keyed hash agg."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = transcripts.select(
        "conv_id", "turn_idx", "role",
        F.unix_timestamp("ts").alias("ts_sec"),
    ).select(
        "conv_id", "role", "ts_sec",
        F.lag("role").over(w).alias("prev_role"),
        F.lag("ts_sec").over(w).alias("prev_sec"),
    )
    replies = lagged.where(
        (F.col("prev_role") == "user") & (F.col("role") == "assistant"))
    return replies.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_exchanges"),
        F.sum(F.col("ts_sec") - F.col("prev_sec")).cast("long")
        .alias("sum_latency_sec"),
        F.max(F.col("ts_sec") - F.col("prev_sec")).cast("long")
        .alias("max_latency_sec"),
    ).withColumn(
        "mean_latency_milli",
        F.expr("(sum_latency_sec * 1000) DIV n_exchanges"),
    )
