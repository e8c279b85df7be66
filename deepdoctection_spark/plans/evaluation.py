"""Evaluation-metric queries: the reference's Evaluator + AccuracyMetric /
ConfusionMetric family (/root/reference/deepdoctection/eval/eval.py:90-218,
eval/accmetric.py:75-525) as distributed joins with a DuckDB oracle.

gt = the engine's own extracted block spans (golden by the extraction
oracles); pred = a deterministic arithmetic perturbation of gt (drops +
category flips — operators/evalmetrics.perturbed_pred) so that both engines
reconstruct the identical prediction and the metric arithmetic is checked
end-to-end (tp/fp/fn, precision/recall/F1, confusion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from deepdoctection_spark.operators.evalmetrics import (
    perturbed_pred,
    span_confusion,
    span_prf,
)
from deepdoctection_spark.operators.extraction import block_spans, extract_transcripts
from deepdoctection_spark.plans import oracles
from deepdoctection_spark.plans.registry import register
from deepdoctection_spark.sources.transcripts import (
    TRANSCRIPT_BASE_SQL,
    build_transcripts,
)


# One persisted gt per (application, sf_dir): each metric query self-joins gt
# against a perturbation of gt with different projections, so Catalyst cannot
# reuse the exchange — without a persist the full extraction stage (the
# dominant cost) would execute twice per metric. The cache is module-level so
# REPEATED query invocations in one session reuse the same persisted frame
# instead of leaking a new cached DataFrame per call. Keyed by applicationId
# (stable, never reused the way id(spark) can be after GC of a stopped
# session) + sf_dir; clear_gt_cache() releases the blocks after a sweep. At
# design scale the equivalent is materializing gt once as a table.
_GT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _GT_CACHE.get(key)
    if cached is not None:
        return cached
    gt = block_spans(
        extract_transcripts(build_transcripts(spark, sf_dir), with_words=False)
    ).persist()
    _GT_CACHE[key] = gt
    return gt


def clear_gt_cache() -> None:
    """Unpersist every cached gt frame (call after a full query sweep so a
    long-lived driver session does not accumulate MEMORY_AND_DISK blocks).
    Frames bound to already-stopped sessions are dropped silently."""
    for df in _GT_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped; nothing to release
    _GT_CACHE.clear()


_PRED_SQL = """
SELECT conv_id, turn_idx,
       md5(conv_id || '|' || turn_idx || '|' || category || '|' ||
           span_begin || '|' || span_end) AS span_id,
       category, span_begin, span_end, reading_order
FROM (
  SELECT conv_id, turn_idx, span_begin, span_end, reading_order,
         CASE WHEN (turn_idx + span_begin) % 7 = 0 THEN 'text'
              ELSE category END AS category
  FROM gt
  WHERE (turn_idx * 31 + span_begin) % 11 != 0
)
"""


def _with_gt_pred(body: str) -> str:
    return (
        f"WITH gt AS ({oracles.oracle_extract_spans()}),\n"
        f"pred AS ({_PRED_SQL})\n{body}"
    )


@register(
    "eval_span_prf",
    _with_gt_pred(
        """
SELECT category,
       tp::BIGINT AS tp, fp::BIGINT AS fp, fn::BIGINT AS fn,
       round(tp / greatest(tp + fp, 1), 6) AS precision,
       round(tp / greatest(tp + fn, 1), 6) AS recall,
       round(2 * (tp / greatest(tp + fp, 1)) * (tp / greatest(tp + fn, 1)) /
             greatest(tp / greatest(tp + fp, 1) + tp / greatest(tp + fn, 1), 1e-12),
             6) AS f1
FROM (
  SELECT coalesce(g.category, p.category) AS category,
         sum(CASE WHEN g.span_id IS NOT NULL AND p.span_id IS NOT NULL
             THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN g.span_id IS NULL THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN p.span_id IS NULL THEN 1 ELSE 0 END) AS fn
  FROM gt g FULL OUTER JOIN pred p ON g.span_id = p.span_id
  GROUP BY 1
)
"""
    ),
)
def q_eval_span_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    gt = _gt(spark, sf_dir)
    return span_prf(gt, perturbed_pred(gt))


@register(
    "eval_teds",
    f"""
WITH base AS ({TRANSCRIPT_BASE_SQL})
SELECT conv_id, turn_idx,
       CASE WHEN turn_idx % 2 = 0 THEN 0.833333 ELSE 1.0 END AS teds
FROM base WHERE (doc_id % 3) = 1
""",
)
def q_eval_teds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEDS between each browser turn's real table HTML and a deterministic
    perturbation (last cell of the last row dropped on even turns). The
    oracle value is the hand-derived Zhang-Shasha result for these template
    trees: removing one <td> + its text node from the 12-node table tree is
    distance 2 → 1 - 2/12 = 0.833333; odd turns are identical → 1.0. The
    Spark side actually parses both HTML strings and runs the full dynamic
    program — agreement validates the metric implementation end-to-end."""
    from pyspark.sql import functions as F

    from deepdoctection_spark.operators.tedsop import teds_scores

    ex = extract_transcripts(build_transcripts(spark, sf_dir), with_words=False)
    pairs = ex.where(F.col("table_html").isNotNull()).select(
        "conv_id",
        "turn_idx",
        F.col("table_html").alias("gt_html"),
        F.when(
            F.col("turn_idx") % 2 == 0,
            F.regexp_replace(
                "table_html", r"<td>[^<]*</td></tr></table>$", "</tr></table>"
            ),
        )
        .otherwise(F.col("table_html"))
        .alias("pred_html"),
    )
    return teds_scores(pairs)


@register(
    "eval_confusion",
    _with_gt_pred(
        """
SELECT g.category AS gt_category, p.category AS pred_category,
       count(*)::BIGINT AS n
FROM gt g JOIN pred p
  ON g.conv_id = p.conv_id AND g.turn_idx = p.turn_idx
 AND g.span_begin = p.span_begin AND g.span_end = p.span_end
GROUP BY 1, 2
"""
    ),
)
def q_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    gt = _gt(spark, sf_dir)
    return span_confusion(gt, perturbed_pred(gt))
