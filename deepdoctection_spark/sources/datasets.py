"""Dataset adapter layer: the reference's DataFlowBaseBuilder.build facade
(/root/reference/deepdoctection/datasets/dataflow_builder.py:32,
datasets/adapter.py:43-61) re-expressed over DataFrames.

build(**kwargs) semantics mapped:
- scan instance files → the transcript extraction pipeline (one row per turn
  with nested spans);
- `max_datapoints` → df.limit;
- category filtering (mapper/cats.filter_cat) → F.filter over the spans
  array + drop rows left empty;
- `cache` (CacheData) → persist;
- training repeat (RepeatedData) → crossJoin(range(epochs)) with an explicit
  epoch column (Spark outputs are unordered; the epoch must be data);
- split selection (train/val/test) → deterministic md5-hash split on conv_id
  (SQL-reproducible: first md5 byte mod 10 → 0-7 train, 8 val, 9 test) so
  membership is stable across runs/engines — the property the reference gets
  from fixed instance files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepdoctection_spark.operators.extraction import extract_transcripts
from deepdoctection_spark.sources.transcripts import build_transcripts

_SPLIT_BUCKETS = {"train": list(range(8)), "val": [8], "test": [9]}


def split_bucket(conv_id_col) -> "F.Column":
    """Deterministic 0-9 bucket from md5(conv_id) — engine-independent."""
    return (
        F.conv(F.substring(F.md5(conv_id_col), 1, 2), 16, 10).cast("int") % 10
    )


class TranscriptDataset:
    """Named dataset over a testdata tier, built lazily per request."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def build(
        self,
        split: str | None = None,
        categories: list[str] | None = None,
        max_datapoints: int | None = None,
        cache: bool = False,
        repeat: int = 1,
    ) -> DataFrame:
        df = extract_transcripts(
            build_transcripts(self.spark, self.sf_dir), with_words=False
        )
        if split is not None:
            buckets = _SPLIT_BUCKETS[split]
            df = df.where(split_bucket(F.col("conv_id")).isin(buckets))
        if categories is not None:
            df = df.withColumn(
                "blocks",
                F.filter("blocks", lambda b: b["category"].isin(*categories)),
            ).where(F.size("blocks") > 0)
        if max_datapoints is not None:
            df = df.limit(max_datapoints)
        if cache:
            df = df.persist()
        if repeat > 1:
            reps = F.broadcast(
                self.spark.range(repeat).withColumnRenamed("id", "epoch")
            )
            df = df.crossJoin(reps)
        return df
