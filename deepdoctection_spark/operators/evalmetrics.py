"""Evaluation metrics: gt-vs-pred span tables → precision/recall/F1 + confusion.

The reference's Evaluator (/root/reference/deepdoctection/eval/eval.py:90-218)
streams two dataflows (golden + predicted) into Python lists and computes
accuracy/precision/recall/F1/confusion in-memory
(/root/reference/deepdoctection/eval/accmetric.py:75-525). Here both sides are
DataFrames and the metrics are joins + aggregations — distributed, no
collect, and the matching criterion is span identity itself: span_id is a
content-addressed md5 over (conv, turn, category, begin, end)
(kernels/ids.py), so an exact id match IS an exact span match — the id-based
matching accmetric.py uses, without materializing either side.

Scale notes: both joins key on span_id / span location — high-cardinality,
uniformly-hashed keys, so the shuffles are balanced by construction; the
per-category aggregate is a partial+final hash agg (tiny output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_prf(gt: DataFrame, pred: DataFrame) -> DataFrame:
    """Per-category tp/fp/fn + precision/recall/F1.

    Inputs: span tables with (span_id, category) columns (block_spans
    shape). A span counts as true-positive iff its span_id appears on both
    sides (exact category+offsets match).
    """
    g = gt.select("span_id", "category")
    p = pred.select("span_id", "category")
    j = g.alias("g").join(p.alias("p"), "span_id", "full_outer")
    per_cat = (
        j.select(
            F.coalesce(F.col("g.category"), F.col("p.category")).alias("category"),
            F.col("g.category").isNotNull().cast("long").alias("in_gt"),
            F.col("p.category").isNotNull().cast("long").alias("in_pred"),
        )
        .groupBy("category")
        .agg(
            F.sum(F.col("in_gt") * F.col("in_pred")).alias("tp"),
            F.sum(F.col("in_pred") * (1 - F.col("in_gt"))).alias("fp"),
            F.sum(F.col("in_gt") * (1 - F.col("in_pred"))).alias("fn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = tp / F.greatest(tp + fp, F.lit(1))
    rec = tp / F.greatest(tp + fn, F.lit(1))
    f1 = 2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))
    return per_cat.select(
        "category",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def span_confusion(gt: DataFrame, pred: DataFrame) -> DataFrame:
    """Confusion matrix over co-located spans (same conv/turn/offsets,
    categories compared) — accmetric.py:207-525's confusion semantics on
    location-matched pairs."""
    keys = ["conv_id", "turn_idx", "span_begin", "span_end"]
    g = gt.select(*keys, F.col("category").alias("gt_category"))
    p = pred.select(*keys, F.col("category").alias("pred_category"))
    return (
        g.join(p, keys)
        .groupBy("gt_category", "pred_category")
        .agg(F.count("*").cast("long").alias("n"))
    )


def perturbed_pred(gt: DataFrame) -> DataFrame:
    """Deterministic synthetic 'prediction': drop every span where
    (turn_idx*31 + span_begin) % 11 == 0, and mis-classify as 'text' where
    (turn_idx + span_begin) % 7 == 0. Arithmetic-only predicates so a SQL
    oracle reproduces the same prediction exactly; span_id is recomputed over
    the flipped category (kernels/ids.py contract), making a category flip
    surface as one fp + one fn, as it would with a real model."""
    keep = ((F.col("turn_idx") * 31 + F.col("span_begin")) % 11) != 0
    flip = ((F.col("turn_idx") + F.col("span_begin")) % 7) == 0
    out = gt.where(keep).withColumn(
        "category", F.when(flip, F.lit("text")).otherwise(F.col("category"))
    )
    return out.withColumn(
        "span_id",
        F.md5(
            F.concat_ws(
                "|",
                F.col("conv_id"),
                F.col("turn_idx").cast("string"),
                F.col("category"),
                F.col("span_begin").cast("string"),
                F.col("span_end").cast("string"),
            )
        ),
    )
