"""COCO mAP evaluator: greedy-matcher semantics on contested cases (the
synthetic parity data is 1:1 by construction; these tests exercise the
general pycocotools-style behavior). End-to-end is the eval_coco_map row of
the parity gate."""

from __future__ import annotations

import pandas as pd

from deepdoctection_spark.operators.cocomap import coco_matches


def _run(spark, gt_rows, pred_rows, thresholds):
    gt = spark.createDataFrame(
        pd.DataFrame(
            gt_rows,
            columns=["conv_id", "turn_idx", "category", "span_begin", "span_end"],
        )
    )
    pred = spark.createDataFrame(
        pd.DataFrame(
            pred_rows,
            columns=[
                "conv_id", "turn_idx", "category", "span_begin", "span_end", "score",
            ],
        )
    )
    out = coco_matches(gt, pred, thresholds).toPandas()
    return {
        (r.span_begin, r.iou_threshold): bool(r.tp) for r in out.itertuples()
    }


def test_higher_score_takes_contested_gt(spark):
    # two preds over ONE gt: the higher-scoring pred matches, the other is FP
    gt = [("c", 0, "text", 0, 100)]
    preds = [
        ("c", 0, "text", 0, 100, 0.6),   # perfect box, lower score
        ("c", 0, "text", 10, 100, 0.9),  # IoU 0.9, higher score → wins
    ]
    m = _run(spark, gt, preds, [0.5])
    assert m[(10, 0.5)] is True
    assert m[(0, 0.5)] is False


def test_pred_takes_highest_iou_unmatched_gt(spark):
    # one pred overlapping two gts: matches the higher-IoU one
    gt = [("c", 0, "text", 0, 100), ("c", 0, "text", 100, 130)]
    preds = [("c", 0, "text", 40, 120, 0.9)]  # IoU .6 vs gt1, .2 vs gt2
    m = _run(spark, gt, preds, [0.5])
    assert m[(40, 0.5)] is True
    # at a stricter threshold the same pred fails
    m2 = _run(spark, gt, preds, [0.7])
    assert m2[(40, 0.7)] is False


def test_per_threshold_rematch_independent(spark):
    # matching restarts per threshold: tp at 0.5, fp at 0.95
    gt = [("c", 0, "text", 0, 100)]
    preds = [("c", 0, "text", 20, 100, 0.9)]  # IoU 0.8
    m = _run(spark, gt, preds, [0.5, 0.95])
    assert m[(20, 0.5)] is True
    assert m[(20, 0.95)] is False
