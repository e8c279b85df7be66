"""Source/sink surface: the reference's serializer family re-expressed as
Spark readers/writers (SURVEY.md §2.1).

Each wrapper is deliberately thin — the point is API parity with the
reference's loaders so a user can switch, while the heavy lifting stays in
Spark's native sources (split planning, predicate pushdown, parallel IO —
everything the single-process serializers at
/root/reference/deepdoctection/dataflow/custom_serialize.py lack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession, path: str, max_datapoints: int | None = None
) -> DataFrame:
    """JSONL scan (SerializerJsonlines.load,
    /root/reference/deepdoctection/dataflow/custom_serialize.py:56-84).
    `max_datapoints` → limit(n): Catalyst pushes a LocalLimit into the scan
    instead of the reference's iterate-and-stop."""
    df = spark.read.json(path)
    return df.limit(max_datapoints) if max_datapoints else df


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (SerializerJsonlines.save, custom_serialize.py:87-107) —
    distributed write, one shard per partition instead of a single file."""
    df.write.mode(mode).json(path)


def read_text_lines(
    spark: SparkSession, path: str, max_datapoints: int | None = None
) -> DataFrame:
    """Line scan (SerializerTabsepFiles.load, custom_serialize.py:110-136);
    one row per line in column `line`."""
    df = spark.read.text(path).withColumnRenamed("value", "line")
    return df.limit(max_datapoints) if max_datapoints else df


def read_files(
    spark: SparkSession, path: str, suffix: str | None = None
) -> DataFrame:
    """Recursive file scan (SerializerFiles.load, custom_serialize.py:163-229).
    The reference walks the tree in-process and zip-joins dirnames×filenames;
    Spark's binaryFile source plans splits across the cluster and prunes with
    pathGlobFilter at the driver. Columns: path, modificationTime, length,
    content(binary). Sorted by path (the reference's sort_files mode)."""
    reader = (
        spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    )
    if suffix:
        reader = reader.option("pathGlobFilter", f"*{suffix}")
    return reader.load(path).orderBy("path")


def load_coco(spark: SparkSession, path: str) -> DataFrame:
    """COCO loader (SerializerCoco.load, custom_serialize.py:459-511).

    The reference builds Python dict indexes img_id→anns and hash-joins
    in-process (CocoParser, custom_serialize.py:232-283). Spark-first: the
    same join expressed declaratively — explode images and annotations from
    the single JSON document, equi-join on image_id (broadcast when small —
    Catalyst decides), regroup annotations per image with collect_list.
    Output: one row per image with `annotations: array<struct>` — the
    reference's nested datapoint shape."""
    doc = spark.read.option("multiLine", "true").json(path)
    imgs = doc.select(F.explode("images").alias("img")).select("img.*")
    anns = (
        doc.select(F.explode("annotations").alias("ann"))
        .select("ann.*")
        .withColumnRenamed("id", "ann_id")
    )
    return (
        imgs.join(anns, imgs["id"] == anns["image_id"], "left")
        .groupBy(imgs["id"].alias("image_id"), "file_name", "height", "width")
        .agg(
            # conditional collect: images with zero annotations must yield an
            # EMPTY array (the reference's empty-list shape), not a length-1
            # array holding one all-null struct — the left join's null columns
            # would otherwise still build a non-null struct per unmatched image
            F.collect_list(
                F.when(
                    F.col("ann_id").isNotNull(),
                    F.struct("ann_id", "category_id", "bbox", "area", "iscrowd"),
                )
            ).alias("annotations")
        )
    )


def split_pages(df: DataFrame, pages_col: str = "pages") -> DataFrame:
    """Document→page rows (SerializerPdfDoc.load, custom_serialize.py:514-559):
    posexplode of a per-document pages array; page_number is the position —
    deterministic, no iteration order dependence."""
    others = [c for c in df.columns if c != pages_col]
    return df.select(
        *others, F.posexplode(pages_col).alias("page_number", "page")
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned sink (SerializerPdfDoc.split, custom_serialize.py:561-573
    generalized): hive-style directory layout, one dir per partition value —
    the scan-side partition-pruning contract for 100 TB outputs."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
