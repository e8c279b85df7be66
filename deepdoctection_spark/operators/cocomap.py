"""COCO mAP on 1-D interval IoU — the reference's CocoMetric family
(/root/reference/deepdoctection/eval/cocometric.py:1-243, which wraps
pycocotools COCOeval) re-expressed as a distributed evaluator:

- per (image=conv_id+turn_idx, category): GREEDY matching of predictions
  (score-descending) to ground-truth spans — each pred takes the unmatched
  gt with the highest IoU ≥ threshold, per IoU threshold 0.50:0.05:0.95
  (pycocotools cocoeval.evaluateImg semantics). Row-local per image →
  cogrouped applyInPandas, tiny groups, one shuffle on the group key.
- global per (category, threshold): precision/recall accumulation over the
  score-descending ranking, monotone interpolated precision (suffix max),
  101-point recall grid integration (cocoeval.accumulate semantics) — all
  JVM-side windows + a broadcast grid join.

Float-parity policy: AP = (sum of the 101 interpolated precisions as
DECIMAL(20,10)) cast to double, divided by 101 — decimal accumulation makes
the sum order-independent (same policy as rel_pricing_summary), and every
precision value is a ratio of small ints (bit-identical across engines).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

IOU_THRESHOLDS = [i / 20.0 for i in range(10, 20)]  # 0.50 .. 0.95
N_RECALL_POINTS = 101

# deterministic prediction synthesis from gt (mirrored in the SQL oracle):
# drop rule → false negatives; flip rule → cross-category false positives;
# jitter shrinks the span's left edge by ~{0,8,18,28,38,48}% of its length
# so IoU vs the source gt sweeps the threshold ladder.
_JITTER_PCT = [0, 8, 18, 28, 38, 48]


def perturbed_scored_pred(gt: DataFrame) -> DataFrame:
    """gt block spans → scored, jittered, partially dropped/flipped preds."""
    L = F.col("span_end") - F.col("span_begin")
    pct = F.element_at(
        F.array(*[F.lit(p) for p in _JITTER_PCT]),
        ((F.col("turn_idx") + F.col("reading_order")) % 6 + 1).cast("int"),
    )
    jit = F.floor((L * pct) / 100).cast("int")
    flip = (F.col("turn_idx") + F.col("span_begin")) % 7 == 0
    return (
        gt.where((F.col("turn_idx") * 31 + F.col("span_begin")) % 11 != 0)
        .select(
            "conv_id",
            "turn_idx",
            F.when(
                flip,
                F.when(F.col("category") == "text", "title").otherwise("text"),
            )
            .otherwise(F.col("category"))
            .alias("category"),
            (F.col("span_begin") + jit).alias("span_begin"),
            "span_end",
            (
                1
                - ((F.col("span_begin") * 7 + F.col("turn_idx")) % 97) / F.lit(200.0)
            ).alias("score"),
        )
    )


def coco_matches(
    gt: DataFrame, pred: DataFrame, thresholds: Iterable[float] = IOU_THRESHOLDS
) -> DataFrame:
    """Greedy per-image matching: one output row per (pred, threshold)."""
    thresholds = list(thresholds)

    def fn(key, gdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        conv, tix, cat = key
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=[
                    "conv_id", "turn_idx", "category", "span_begin",
                    "score", "iou_threshold", "tp",
                ]
            )
        p = pdf.sort_values(
            ["score", "p_begin"], ascending=[False, True]
        ).reset_index(drop=True)
        pb = p["p_begin"].to_numpy(dtype=np.float64)
        pe = p["p_end"].to_numpy(dtype=np.float64)
        if len(gdf):
            gb = gdf["span_begin"].to_numpy(dtype=np.float64)
            ge = gdf["span_end"].to_numpy(dtype=np.float64)
            inter = np.clip(
                np.minimum(pe[:, None], ge[None, :])
                - np.maximum(pb[:, None], gb[None, :]),
                0,
                None,
            )
            union = (pe - pb)[:, None] + (ge - gb)[None, :] - inter
            iou = inter / np.clip(union, 1e-9, None)
        else:
            iou = np.zeros((len(p), 0))
        rows = []
        for t in thresholds:
            taken = np.zeros(iou.shape[1], dtype=bool)
            for i in range(len(p)):
                cand = np.where((iou[i] >= t) & ~taken)[0]
                tp = False
                if len(cand):
                    taken[cand[np.argmax(iou[i][cand])]] = True
                    tp = True
                rows.append(
                    (
                        conv, int(tix), cat, int(p["p_begin"].iat[i]),
                        float(p["score"].iat[i]), t, tp,
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "turn_idx", "category", "span_begin",
                "score", "iou_threshold", "tp",
            ],
        )

    keys = ["conv_id", "turn_idx", "category"]
    # pred derives from gt, so the cogroup is a self-join: identically-named
    # attributes on both sides get rewritten by Spark's self-join
    # deduplication and the right side silently loses columns. Distinct
    # names (p_begin/p_end) on the pred side avoid the collision.
    pred_side = pred.select(
        *keys,
        F.col("span_begin").alias("p_begin"),
        F.col("span_end").alias("p_end"),
        "score",
    )
    return (
        gt.select(*keys, "span_begin", "span_end")
        .groupBy(*keys)
        .cogroup(pred_side.groupBy(*keys))
        .applyInPandas(
            fn,
            "conv_id string, turn_idx int, category string, span_begin int, "
            "score double, iou_threshold double, tp boolean",
        )
    )


def coco_ap(spark: SparkSession, gt: DataFrame, matches: DataFrame) -> DataFrame:
    """(category, iou_threshold, n_gt, ap) via 101-point interpolation."""
    n_gt = gt.groupBy("category").agg(F.count("*").cast("long").alias("n_gt"))
    w = Window.partitionBy("category", "iou_threshold").orderBy(
        F.desc("score"), "conv_id", "turn_idx", "span_begin"
    )
    ranked = matches.withColumn("rk", F.row_number().over(w)).withColumn(
        "ctp", F.sum(F.col("tp").cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    pr = (
        ranked.join(F.broadcast(n_gt), "category")
        .withColumn("precision", F.col("ctp") / F.col("rk"))
        .withColumn("recall", F.col("ctp") / F.col("n_gt"))
        .withColumn(
            "p_interp",
            F.max("precision").over(
                Window.partitionBy("category", "iou_threshold")
                .orderBy("rk")
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            ),
        )
        .select("category", "iou_threshold", "n_gt", "recall", "p_interp")
    )
    grid = spark.range(N_RECALL_POINTS).select((F.col("id") / 100).alias("r"))
    keys = pr.select("category", "iou_threshold", "n_gt").distinct()
    contrib = (
        keys.crossJoin(F.broadcast(grid))
        .join(
            pr.withColumnRenamed("n_gt", "n_gt2"),
            ["category", "iou_threshold"],
        )
        .where(F.col("recall") >= F.col("r"))
        .groupBy("category", "iou_threshold", "n_gt", "r")
        .agg(F.max("p_interp").alias("p_at_r"))
    )
    # grid points beyond max recall contribute 0: left-join the full grid
    full = keys.crossJoin(F.broadcast(grid)).join(
        contrib, ["category", "iou_threshold", "n_gt", "r"], "left"
    )
    return (
        full.groupBy("category", "iou_threshold", "n_gt")
        .agg(
            (
                F.sum(
                    F.coalesce(F.col("p_at_r"), F.lit(0.0)).cast("decimal(20,10)")
                ).cast("double")
                / N_RECALL_POINTS
            ).alias("ap")
        )
    )


def eval_coco_map(spark: SparkSession, gt: DataFrame) -> DataFrame:
    pred = perturbed_scored_pred(gt)
    return coco_ap(spark, gt, coco_matches(gt, pred))
