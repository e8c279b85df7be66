"""LM-service queries (stub-model serving pattern) with DuckDB oracles.

The stub logits are md5-derived (operators/lmserve.py), so the oracle
recomputes every predicted label exactly: score k = byte k of the md5 hex
digest; argmax with first-max-wins tie-break expressed as an ordered CASE
over greatest() of the remaining scores."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deepdoctection_spark.operators.extraction import extract_transcripts, word_tokens
from deepdoctection_spark.operators.lmserve import (
    SEQ_LABELS,
    TOKEN_TAGS,
    lm_sequence_labels,
    lm_token_tags,
)
from deepdoctection_spark.plans import oracles
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.sources.transcripts import build_transcripts


def _byte(hex_expr: str, k: int) -> str:
    return f"('0x' || substr({hex_expr}, {2 * k + 1}, 2))::INT"


def _argmax_case(score_exprs: list[str], labels: list[str]) -> str:
    """First-max-wins argmax as an ordered CASE (matches Python's
    max(key=(score, -i)) tie-break)."""
    clauses = []
    for i in range(len(labels) - 1):
        remaining = score_exprs[i + 1 :]
        rest_max = (
            f"greatest({', '.join(remaining)})"
            if len(remaining) > 1
            else remaining[0]
        )
        clauses.append(f"WHEN {score_exprs[i]} >= {rest_max} THEN '{labels[i]}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{labels[-1]}' END"


def _token_tag_sql() -> str:
    scores = [_byte("h", k) for k in range(len(TOKEN_TAGS))]
    word_sql = oracles.oracle_word_tokens().rstrip()
    return f"""
WITH words AS ({word_sql}),
hashed AS (SELECT conv_id, turn_idx, word_idx, token, md5('tok|' || token) AS h FROM words)
SELECT conv_id, turn_idx, word_idx, token,
       {_argmax_case(scores, TOKEN_TAGS)} AS token_tag
FROM hashed
"""


def _seq_label_sql() -> str:
    scores = [_byte("h", k) for k in range(len(SEQ_LABELS))]
    text_sql = oracles.oracle_extract_text().rstrip()
    return f"""
WITH et AS ({text_sql}),
hashed AS (SELECT conv_id, turn_idx, md5('seq|' || extracted_text) AS h FROM et)
SELECT conv_id, turn_idx,
       {_argmax_case(scores, SEQ_LABELS)} AS doc_label
FROM hashed
"""


@register("lm_token_tags", _token_tag_sql())
def q_lm_token_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = extract_transcripts(build_transcripts(spark, sf_dir), with_words=True)
    return lm_token_tags(word_tokens(ex))


@register("lm_sequence_labels", _seq_label_sql())
def q_lm_sequence_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = extract_transcripts(build_transcripts(spark, sf_dir), with_words=False)
    return lm_sequence_labels(ex)
