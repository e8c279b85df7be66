"""Crawl snapshot diff (operators/weburl.crawl_snapshot_diff)."""

from __future__ import annotations

from deepdoctection_spark.operators.weburl import crawl_snapshot_diff


def test_all_four_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "B"), ("u4", "d")], "url string, fingerprint string"
    )
    out = {r["url"]: r["status"] for r in crawl_snapshot_diff(old, new).collect()}
    assert out == {
        "u1": "unchanged", "u2": "changed", "u3": "deleted", "u4": "added",
    }
