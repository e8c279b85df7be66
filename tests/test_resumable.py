"""Resume semantics: a killed run continues from the manifest and produces
byte-identical results to a single clean run (SURVEY.md §5 engine invariants).
"""

from __future__ import annotations

import pytest

from deepdoctection_spark.jobs import (
    pending_buckets,
    read_manifest,
    run_resumable_extract,
)
from deepdoctection_spark.jobs.resumable import load_extracted
from deepdoctection_spark.sources.transcripts import build_transcripts

N_BUCKETS = 8
WAVE = 2


def _fingerprint(df):
    """Order-insensitive content hash of the full result."""
    from pyspark.sql import functions as F

    flat = df.select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        F.to_json("blocks").alias("blocks_json"),
        F.to_json("cells").alias("cells_json"),
        F.to_json("words").alias("words_json"),
    )
    h = flat.select(
        F.sum(
            F.xxhash64(F.concat_ws("\x01", *[F.col(c) for c in flat.columns])).cast(
                "decimal(38,0)"
            )
        ).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    return (h["h"], h["n"])


def test_resume_after_crash_matches_clean_run(spark, sf_small, tmp_path):
    t = build_transcripts(spark, sf_small)

    clean_dir = str(tmp_path / "clean")
    res = run_resumable_extract(
        spark, t, clean_dir, n_buckets=N_BUCKETS, wave_size=WAVE
    )
    assert res.waves == N_BUCKETS // WAVE
    assert sorted(res.processed_buckets) == list(range(N_BUCKETS))
    clean_fp = _fingerprint(load_extracted(spark, clean_dir))
    assert clean_fp[1] > 0

    # crashed run: dies after 1 committed wave
    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable_extract(
            spark, t, crash_dir, n_buckets=N_BUCKETS, wave_size=WAVE,
            fail_after_waves=1,
        )
    done_after_crash = {
        e["bucket"] for e in read_manifest(crash_dir) if e["status"] == "done"
    }
    assert len(done_after_crash) == WAVE
    assert len(pending_buckets(crash_dir, N_BUCKETS)) == N_BUCKETS - WAVE

    # resume: processes ONLY the remaining buckets
    res2 = run_resumable_extract(
        spark, t, crash_dir, n_buckets=N_BUCKETS, wave_size=WAVE
    )
    assert res2.skipped_buckets == WAVE
    assert sorted(res2.processed_buckets) == sorted(
        set(range(N_BUCKETS)) - done_after_crash
    )
    assert _fingerprint(load_extracted(spark, crash_dir)) == clean_fp

    # idempotence: a third invocation is a no-op
    res3 = run_resumable_extract(
        spark, t, crash_dir, n_buckets=N_BUCKETS, wave_size=WAVE
    )
    assert res3.waves == 0 and res3.skipped_buckets == N_BUCKETS


def test_manifest_carries_per_partition_metrics(spark, sf_small, tmp_path):
    t = build_transcripts(spark, sf_small)
    out = str(tmp_path / "m")
    run_resumable_extract(spark, t, out, n_buckets=4, wave_size=4)
    entries = read_manifest(out)
    assert {e["bucket"] for e in entries} == {0, 1, 2, 3}
    assert all(e["wall_ms"] > 0 for e in entries)
    assert sum(e["rows"] for e in entries) == t.count()
    assert all(e["attempt"] == 1 for e in entries)


def test_resume_rejects_changed_bucket_count(spark, sf_small, tmp_path):
    """n_buckets is part of the hash layout; resuming with a different value
    must fail loudly instead of silently dropping conversations."""
    t = build_transcripts(spark, sf_small).limit(64)
    out = str(tmp_path / "nb")
    run_resumable_extract(spark, t, out, n_buckets=8, wave_size=8)
    with pytest.raises(ValueError, match="n_buckets"):
        run_resumable_extract(spark, t, out, n_buckets=4, wave_size=4)


def test_load_extracted_empty_before_first_commit(spark, tmp_path):
    from deepdoctection_spark.jobs.resumable import load_extracted

    df = load_extracted(spark, str(tmp_path / "never_ran"))
    assert df.count() == 0
    assert "extracted_text" in df.columns


def test_manifest_records_quarantined_counts(spark, tmp_path):
    """A poison turn's error-column quarantine is visible in the manifest
    (per-bucket `quarantined`) and on the result — not just executor logs."""
    from deepdoctection_spark.jobs.resumable import read_manifest, run_resumable_extract

    rows = [
        ("c1", 0, "user", "good text", "", None),
        ("c1", None, "user", "poison: null turn_idx", "", None),
        ("c2", 1, "user", "more text", "", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = str(tmp_path / "quar_job")
    res = run_resumable_extract(spark, df, out, n_buckets=4, wave_size=4)
    assert res.rows_written == 3
    assert res.rows_quarantined == 1
    entries = read_manifest(out)
    assert sum(e["quarantined"] for e in entries) == 1
    assert all("quarantined" in e for e in entries)
