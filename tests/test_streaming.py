"""Streaming surface: the same extraction stage under Structured Streaming
produces exactly the batch results; windowed reassembly is deterministic
under multi-file (out-of-order) arrival.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.operators.extraction import extract_transcripts
from deepdoctection_spark.sources.transcripts import build_transcripts
from deepdoctection_spark.streaming import (
    stream_dedup_turns,
    stream_extract,
    stream_reassemble,
    stream_transcripts,
)


def _write_stream_input(spark, sf_small, path: str) -> None:
    # several files so the availableNow run sees multi-file arrival order
    build_transcripts(spark, sf_small).repartition(4).write.mode("overwrite").parquet(
        path
    )


def _run_to_memory(stream_df, name: str, complete: bool = False):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if complete else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_extract_equals_batch(spark, sf_small, tmp_path):
    path = str(tmp_path / "in")
    _write_stream_input(spark, sf_small, path)

    q = _run_to_memory(
        stream_extract(stream_transcripts(spark, path)), "ex_stream"
    )
    assert q.lastProgress is not None
    got = spark.table("ex_stream")

    batch = extract_transcripts(
        spark.read.parquet(path), with_words=True, keep_ts=True
    )
    key = ["conv_id", "turn_idx"]
    fp = lambda df: sorted(
        (r["conv_id"], r["turn_idx"], r["extracted_text"], r["n_blocks"])
        for r in df.select(*key, "extracted_text", "n_blocks").collect()
    )
    assert fp(got) == fp(batch)
    assert got.count() == batch.count()
    # event time survived the Arrow stage
    assert got.where(F.col("ts").isNull()).count() == 0


def test_stream_reassemble_windows(spark, sf_small, tmp_path):
    path = str(tmp_path / "in2")
    _write_stream_input(spark, sf_small, path)

    # complete mode: append would (correctly) hold back windows the watermark
    # hasn't closed — for whole-result equality we want every window emitted.
    q = _run_to_memory(
        stream_reassemble(stream_transcripts(spark, path), window="1 hour"),
        "conv_stream",
        complete=True,
    )
    got = spark.table("conv_stream")
    # every conversation appears, each turn in exactly one window
    n_convs_in = (
        spark.read.parquet(path).select("conv_id").distinct().count()
    )
    assert got.select("conv_id").distinct().count() == n_convs_in
    total_turns = got.agg(F.sum("n_turns")).collect()[0][0]
    assert total_turns == spark.read.parquet(path).count()
    # inside a window, text is ordered by turn_idx: spot-check one conv
    row = (
        got.where(F.col("n_turns") > 2)
        .orderBy("conv_id", "window_start")
        .limit(1)
        .collect()
    )
    if row:
        conv_id, win_start = row[0]["conv_id"], row[0]["window_start"]
        turns = (
            extract_transcripts(
                spark.read.parquet(path).where(F.col("conv_id") == conv_id),
                with_words=False,
                keep_ts=True,
            )
            .where(
                (F.col("ts") >= win_start)
                & (F.col("ts") < F.lit(win_start) + F.expr("INTERVAL 1 HOUR"))
            )
            .orderBy("turn_idx")
            .select("extracted_text")
            .collect()
        )
        assert row[0]["conv_text"] == "\n\n".join(t["extracted_text"] for t in turns)


def test_stream_dedup_drops_redelivery(spark, sf_small, tmp_path):
    path = str(tmp_path / "in3")
    t = build_transcripts(spark, sf_small).limit(100)
    # duplicate the whole feed (an at-least-once source re-delivering)
    t.unionByName(t).repartition(4).write.mode("overwrite").parquet(path)

    q = _run_to_memory(
        stream_dedup_turns(stream_transcripts(spark, path)), "dedup_stream"
    )
    got = spark.table("dedup_stream")
    assert got.count() == 100
    assert got.select("conv_id", "turn_idx").distinct().count() == 100


def test_sessionize_gap_splits_and_orders(spark, tmp_path):
    """Turns 40s apart with a 60s gap stay in one session; a 10-minute hole
    splits sessions. Arrival order is scrambled; output must order by
    turn_idx."""
    import datetime as dt

    from deepdoctection_spark.streaming.sessionize import sessionize_conversations

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    # conv A: turns 0..3 at +0,40,80,120s  (one session)
    for i, off in enumerate([0, 40, 80, 120]):
        rows.append(("A", i, "user", f"a{i}", "", base + dt.timedelta(seconds=off)))
    # conv A: turns 4..5 at +1000,1040s (second session after a >60s hole)
    for i, off in [(4, 1000), (5, 1040)]:
        rows.append(("A", i, "user", f"a{i}", "", base + dt.timedelta(seconds=off)))
    # conv B: single session
    for i, off in [(0, 10), (1, 30)]:
        rows.append(("B", i, "user", f"b{i}", "", base + dt.timedelta(seconds=off)))
    # late "closer" rows push the watermark far past every session above
    rows.append(("Z", 0, "user", "z", "", base + dt.timedelta(hours=2)))

    path = str(tmp_path / "sess_in")
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(3).write.mode("overwrite").parquet(path)

    stream = stream_extract(stream_transcripts(spark, path), with_words=False)
    q = (
        sessionize_conversations(stream, gap_seconds=60, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["conv_id"], r["n_turns"]): r["conv_text"]
        for r in spark.table("sessions").collect()
    }
    assert ("A", 4) in got and got[("A", 4)] == "a0\n\na1\n\na2\n\na3"
    assert ("A", 2) in got and got[("A", 2)] == "a4\n\na5"
    assert ("B", 2) in got and got[("B", 2)] == "b0\n\nb1"


def test_sessionize_late_row_bridges_gap_across_batches(spark, tmp_path):
    """Event-time correctness: a late-but-within-watermark turn delivered in
    a LATER micro-batch bridges what looked like a gap in the earlier batch.
    Output must be one session {0,200,400} — identical to single-batch
    arrival — not the eager split {0} + {200,400}."""
    import datetime as dt
    import os

    from deepdoctection_spark.streaming.sessionize import sessionize_conversations

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    d = tmp_path / "bridge_in"
    os.makedirs(d)
    # batch 1: turns at t=0 and t=400 (apparent 400s hole > 300s gap)
    spark.createDataFrame(
        [
            ("A", 0, "user", "a0", "", base),
            ("A", 2, "user", "a2", "", base + dt.timedelta(seconds=400)),
        ],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "f1"))
    # batch 2: the bridging turn at t=200 (inside the 10-min watermark) plus
    # a closer row far in the future to flush the session
    spark.createDataFrame(
        [
            ("A", 1, "user", "a1", "", base + dt.timedelta(seconds=200)),
            ("Z", 0, "user", "z", "", base + dt.timedelta(hours=3)),
        ],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "f2"))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    stream = stream_extract(src, with_words=False)
    q = (
        sessionize_conversations(stream, gap_seconds=300, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("bridge_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["conv_id"]: (r["n_turns"], r["conv_text"])
        for r in spark.table("bridge_sessions").collect()
    }
    assert got.get("A") == (3, "a0\n\na1\n\na2")


def test_stream_interval_join_across_microbatches(spark, tmp_path):
    """Stream-stream inner join must match rows ACROSS micro-batches: the
    error arrives in file/batch 1, its in-window click in file/batch 2 —
    the join state has to hold batch-1 rows until the range closes. Late
    out-of-window clicks must not match."""
    import pandas as pd
    from pyspark.sql import functions as F

    d = tmp_path / "ev"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    f1 = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [7, 7],
        "event_type": ["error", "click"],
        "ts": [base, base + h],          # click@+1h: inside [0, 6h]
    })
    f2 = pd.DataFrame({
        "event_id": [3, 4],
        "user_id": [7, 7],
        "event_type": ["click", "click"],
        "ts": [base + 5 * h, base + 7 * h],  # +5h inside; +7h OUTSIDE
    })
    spark.createDataFrame(f1).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(f2).coalesce(1).write.parquet(str(d / "f2"))
    schema = spark.read.parquet(str(d / "*")).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
    ).withWatermark("error_ts", "1 hour")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", "1 hour")
    joined = clicks.join(
        errors,
        F.expr("c_user = e_user AND click_ts >= error_ts "
               "AND click_ts <= error_ts + INTERVAL 6 HOURS"),
    ).select("error_id", "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("xbatch_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r.error_id, r.click_id)
                 for r in spark.table("xbatch_join").collect())
    assert got == [(1, 2), (1, 3)]


def test_reassemble_drops_beyond_watermark_rows_exactly(spark, tmp_path):
    """Late-data differential for the windowed reassembly (the event-time
    contract at scale): a row delivered in a later micro-batch with event
    time BEYOND the watermark must be dropped, and the streamed result must
    equal the batch recompute minus EXACTLY that row — nothing else moves.
    A row equally late in arrival but within the watermark must survive.

    The watermark raised by the pusher batch takes effect for late-row
    FILTERING one micro-batch later (Spark applies batch N-1's commit
    watermark to batch N's input), so a filler batch sits between the
    pusher and the late delivery."""
    import datetime as dt
    import time

    from deepdoctection_spark.streaming import (
        stream_reassemble,
        stream_transcripts,
    )

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    sec = lambda s: base + dt.timedelta(seconds=s)
    d = tmp_path / "late_in"
    d.mkdir()
    # batch 1: conv A on-time turns + a pusher that drives the watermark
    # (default 10 min) to 2h50m
    spark.createDataFrame(
        [
            ("A", 0, "user", "a0", "", sec(0)),
            ("A", 1, "assistant", "a1", "", sec(60)),
            ("W", 0, "user", "w0", "", sec(3 * 3600)),
        ],
        schema,
    ).coalesce(1).write.parquet(str(d / "f1"))
    time.sleep(1.1)  # distinct mod-times pin the micro-batch order
    # batch 2: filler — lets the pusher's 2h50m watermark become the
    # late-row filter for the NEXT batch
    spark.createDataFrame(
        [("F", 0, "user", "f0", "", sec(3 * 3600 + 30))], schema
    ).coalesce(1).write.parquet(str(d / "f2"))
    time.sleep(1.1)
    # batch 3: one row far beyond the watermark (window end 1h << 2h50m →
    # dropped) and one on-time row in an open window
    spark.createDataFrame(
        [
            ("A", 2, "user", "a2-late-dropped", "", sec(120)),
            ("A", 3, "user", "a3", "", sec(3 * 3600 + 60)),
        ],
        schema,
    ).coalesce(1).write.parquet(str(d / "f3"))
    time.sleep(1.1)
    # batch 4: closer pushes the final watermark past every window above
    spark.createDataFrame(
        [("Z", 0, "user", "z", "", sec(10 * 3600))], schema
    ).coalesce(1).write.parquet(str(d / "f4"))

    q = _run_to_memory(
        stream_reassemble(
            stream_transcripts(spark, str(d / "*"), max_files_per_trigger=1)
        ),
        "late_reassemble",
    )
    q.awaitTermination(120)
    fp = lambda df: sorted(
        (r["conv_id"], r["window_start"], r["n_turns"], r["conv_text"])
        for r in df.collect()
    )
    got = fp(spark.table("late_reassemble").where(F.col("conv_id") != "Z"))

    # batch recompute over the SAME code path (withWatermark is a no-op on
    # batch DataFrames), minus exactly the beyond-watermark row
    batch_in = spark.read.parquet(str(d / "*")).where(F.col("conv_id") != "Z")
    batch_minus_late = fp(
        stream_reassemble(batch_in.where(F.col("turn_idx") != 2))
    )
    assert got == batch_minus_late
    # and versus the FULL batch recompute the diff is exactly one window:
    # A's [00:00, 01:00) holds 2 turns streamed vs 3 in batch
    batch_all = fp(stream_reassemble(batch_in))
    only_in_batch = [r for r in batch_all if r not in got]
    only_in_stream = [r for r in got if r not in batch_all]
    assert [(r[0], r[2]) for r in only_in_batch] == [("A", 3)]
    assert [(r[0], r[2]) for r in only_in_stream] == [("A", 2)]
    assert "a2-late-dropped" not in " ".join(r[3] for r in got)
    # the equally-late-ARRIVING but within-watermark row survived
    assert any(r[0] == "A" and "a3" in r[3] for r in got)
