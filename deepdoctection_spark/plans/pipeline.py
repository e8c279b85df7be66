"""Query registry: every operator exposed as (spark, sf_dir) -> DataFrame,
with a matching DuckDB oracle where SQL can express the semantics.

The registry is the engine's public query surface — the analogue of the
reference's analyzer entry points (/root/reference/deepdoctection/analyzer/dd.py:404-465
+ datasets/dataflow_builder.py) re-expressed as named DataFrame builders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepdoctection_spark.operators.extraction import (
    block_spans,
    cell_spans,
    extract_transcripts,
    word_tokens,
)
from deepdoctection_spark.operators.reassembly import reassemble_conversations
from deepdoctection_spark.plans import oracles
from deepdoctection_spark.sources.transcripts import build_transcripts

from deepdoctection_spark.plans.registry import QUERIES, ORACLES, register  # noqa: F401


def _extracted(spark: SparkSession, sf_dir: str, with_words: bool = False) -> DataFrame:
    return extract_transcripts(build_transcripts(spark, sf_dir), with_words=with_words)


# ---------------------------------------------------------------------------
# Extraction family (north rule): real parsing vs template-ground-truth oracle
# ---------------------------------------------------------------------------


@register("extract_text", oracles.oracle_extract_text())
def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _extracted(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "tool", "extracted_text", "n_blocks"
    )


@register("extract_spans", oracles.oracle_extract_spans())
def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return block_spans(_extracted(spark, sf_dir))


@register("table_cells", oracles.oracle_table_cells())
def q_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cell_spans(_extracted(spark, sf_dir))


@register("word_tokens", oracles.oracle_word_tokens())
def q_word_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_tokens(_extracted(spark, sf_dir, with_words=True))


@register("conversation_text", oracles.oracle_conversation_text())
def q_conversation_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reassemble_conversations(_extracted(spark, sf_dir))


def _oracle_dataset_build() -> str:
    """val-split, category-filtered span export: the extract_spans oracle
    restricted by the md5 split bucket and the category list."""
    return (
        f"SELECT * FROM ({oracles.oracle_extract_spans()}) s "
        "WHERE (('0x' || substr(md5(conv_id), 1, 2))::INT % 10) = 8 "
        "AND category IN ('title', 'table')"
    )


@register("dataset_build", _oracle_dataset_build())
def q_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datasets adapter facade (DataFlowBaseBuilder.build,
    /root/reference/deepdoctection/datasets/dataflow_builder.py:32): val
    split + category filter, exported as flat span rows."""
    from deepdoctection_spark.sources.datasets import TranscriptDataset

    ds = TranscriptDataset(spark, sf_dir).build(
        split="val", categories=["title", "table"]
    )
    return block_spans(ds)


@register("table_html", oracles.oracle_table_html())
def q_table_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = _extracted(spark, sf_dir)
    return ex.filter(F.col("table_html").isNotNull()).select(
        "conv_id", "turn_idx", "table_html"
    )
