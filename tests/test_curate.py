"""End-to-end resumable curation job: decisions commit + filtered corpus
write + kill/resume identity (the curated_corpus parity row checks values)."""

from __future__ import annotations

import pytest

from deepdoctection_spark.jobs.curate import (
    load_curated,
    run_resumable_curation,
)


def _docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


def _content(spark, out_dir):
    return sorted(
        (r["doc_id"], r["text"], r["pred_lang"], r["quality"])
        for r in load_curated(spark, out_dir).collect()
    )


def test_single_shot_matches_query(spark, sf_small):
    import __spark_entry__  # registers all queries
    from deepdoctection_spark.plans.registry import QUERIES

    out = "/tmp/ddspark_curate_single"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    res = run_resumable_curation(
        spark, _docs(spark, sf_small), out, n_buckets=8, wave_size=4
    )
    assert not res.decisions_reused and res.n_kept > 0
    got = _content(spark, out)
    expected = sorted(
        (r["doc_id"], r["text"], r["pred_lang"], r["quality"])
        for r in QUERIES["curated_corpus"](spark, sf_small).collect()
    )
    assert got == expected


def test_kill_resume_identical_output(spark, sf_small):
    import shutil

    docs = _docs(spark, sf_small)
    a, b = "/tmp/ddspark_curate_a", "/tmp/ddspark_curate_b"
    for d in (a, b):
        shutil.rmtree(d, ignore_errors=True)
    run_resumable_curation(spark, docs, a, n_buckets=8, wave_size=4)

    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable_curation(
            spark, docs, b, n_buckets=8, wave_size=4, fail_after_waves=1
        )
    res2 = run_resumable_curation(spark, docs, b, n_buckets=8, wave_size=4)
    assert res2.decisions_reused  # stage-1 commit survived the kill
    assert res2.skipped_buckets == 4  # one committed wave not recomputed
    assert _content(spark, a) == _content(spark, b)


def test_resume_wrong_bucket_count_rejected(spark, sf_small):
    import shutil

    out = "/tmp/ddspark_curate_nb"
    shutil.rmtree(out, ignore_errors=True)
    docs = _docs(spark, sf_small)
    with pytest.raises(RuntimeError):
        run_resumable_curation(
            spark, docs, out, n_buckets=8, wave_size=4, fail_after_waves=1
        )
    with pytest.raises(ValueError, match="n_buckets"):
        run_resumable_curation(spark, docs, out, n_buckets=16)
