"""Dataset adapter facade (DataFlowBaseBuilder.build semantics); the split/
category parity is the dataset_build row of the parity gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.sources.datasets import TranscriptDataset, split_bucket


def test_splits_partition_the_corpus(spark, sf_small):
    ds = TranscriptDataset(spark, sf_small)
    n_all = ds.build().count()
    parts = {s: ds.build(split=s).count() for s in ("train", "val", "test")}
    assert sum(parts.values()) == n_all
    assert parts["train"] > parts["val"] >= 0


def test_split_membership_is_conv_stable(spark, sf_small):
    # every conv lands wholly in one split (bucket is a function of conv_id)
    ds = TranscriptDataset(spark, sf_small)
    v = ds.build(split="val").select("conv_id").distinct()
    t = ds.build(split="train").select("conv_id").distinct()
    assert v.join(t, "conv_id").count() == 0


def test_category_filter_prunes_spans(spark, sf_small):
    ds = TranscriptDataset(spark, sf_small)
    df = ds.build(categories=["table"])
    bad = df.select(
        F.size(F.filter("blocks", lambda b: b["category"] != "table")).alias("n")
    ).where(F.col("n") > 0)
    assert bad.count() == 0
    assert df.count() > 0


def test_repeat_adds_epoch_column(spark, sf_small):
    ds = TranscriptDataset(spark, sf_small)
    base = ds.build(max_datapoints=10)
    rep = ds.build(max_datapoints=10, repeat=3)
    assert rep.count() == 3 * base.count()
    assert set(r["epoch"] for r in rep.select("epoch").distinct().collect()) == {0, 1, 2}


def test_split_bucket_matches_duckdb():
    import duckdb

    ids = [f"conv-{i:05d}" for i in range(50)]
    con = duckdb.connect()
    expected = {
        cid: con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 2))::INT % 10", [cid]
        ).fetchone()[0]
        for cid in ids
    }
    import hashlib

    for cid in ids:
        got = int(hashlib.md5(cid.encode()).hexdigest()[:2], 16) % 10
        assert got == expected[cid]
