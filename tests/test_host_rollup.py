"""Domain-level curation rollup (operators/weburl.host_rollup)."""

from __future__ import annotations

from deepdoctection_spark.operators.weburl import host_rollup


def test_verdict_branches_and_integer_ratios(spark):
    rows = [
        # clean host: 4 unique pages, nothing blocked -> keep
        *[("keep.org", f"f{i}", 10, False) for i in range(4)],
        # dup-heavy host: 4 pages, 2 unique -> 500000 ppm -> sample
        ("dup.org", "a", 10, False), ("dup.org", "a", 10, False),
        ("dup.org", "b", 30, False), ("dup.org", "b", 30, False),
        # blocked-heavy host: 2 of 4 blocked -> 500000 ppm -> drop
        # (also fully duplicated: drop must win over sample)
        *[("blk.org", "x", 5, i < 2) for i in range(4)],
    ]
    df = spark.createDataFrame(
        rows, "host string, fingerprint string, n_tokens long, blocked boolean"
    )
    out = {r["host"]: r for r in host_rollup(df).collect()}
    assert out["keep.org"]["verdict"] == "keep"
    assert out["keep.org"]["dup_ppm"] == 0
    assert out["dup.org"]["verdict"] == "sample"
    assert out["dup.org"]["dup_ppm"] == 500_000
    assert out["dup.org"]["mean_tokens_milli"] == 20_000
    assert out["blk.org"]["verdict"] == "drop"  # drop outranks sample
    assert out["blk.org"]["blocked_ppm"] == 500_000
