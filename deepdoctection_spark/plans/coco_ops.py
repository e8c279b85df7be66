"""COCO mAP query with a DuckDB oracle.

Spark runs the REAL evaluator (operators/cocomap.py): cogrouped greedy
per-image matching + windowed 101-point PR integration. The oracle never
matches greedily — the synthetic prediction geometry (each pred is a shrunk
copy of exactly one gt span; spans are disjoint) makes the greedy outcome
provably equal to `not flipped AND src_iou >= t`, so the oracle derives tp
analytically and then performs the same rank/interpolation arithmetic in
SQL. Agreement checks the greedy matcher, the ranking tiebreak, the suffix
max, the recall-grid join, and the decimal AP accumulation end-to-end.
"""

from __future__ import annotations

from deepdoctection_spark.operators.cocomap import _JITTER_PCT, eval_coco_map
from deepdoctection_spark.plans import oracles
from deepdoctection_spark.plans.evaluation import _gt
from deepdoctection_spark.plans.registry import register

_JIT_CASE = (
    "CASE (turn_idx + reading_order) % 6 "
    + " ".join(f"WHEN {i} THEN {p}" for i, p in enumerate(_JITTER_PCT[:-1]))
    + f" ELSE {_JITTER_PCT[-1]} END"
)


def oracle_coco_map() -> str:
    return f"""
WITH gt AS ({oracles.oracle_extract_spans()}),
predbase AS (
  SELECT *, (span_end - span_begin) AS L,
         ((span_end - span_begin) * ({_JIT_CASE})) // 100 AS jit,
         ((turn_idx + span_begin) % 7 = 0) AS flipped,
         1 - ((span_begin * 7 + turn_idx) % 97) / 200.0 AS score
  FROM gt
  WHERE (turn_idx * 31 + span_begin) % 11 != 0
),
pred AS (
  SELECT conv_id, turn_idx,
         CASE WHEN flipped THEN (CASE WHEN category = 'text' THEN 'title' ELSE 'text' END)
              ELSE category END AS category,
         (span_begin + jit)::INT AS span_begin, score, flipped,
         (L - jit)::DOUBLE / L AS src_iou
  FROM predbase
),
thr AS (SELECT (i / 20.0)::DOUBLE AS t FROM range(10, 20) AS u(i)),
m AS (
  SELECT p.category, p.conv_id, p.turn_idx, p.span_begin, p.score, t.t AS iou_threshold,
         (NOT p.flipped AND p.src_iou >= t.t) AS tp
  FROM pred p CROSS JOIN thr t
),
ngt AS (SELECT category, count(*)::BIGINT AS n_gt FROM gt GROUP BY 1),
ranked AS (
  SELECT category, iou_threshold, tp,
         row_number() OVER (PARTITION BY category, iou_threshold
                            ORDER BY score DESC, conv_id, turn_idx, span_begin) AS rk,
         sum(CASE WHEN tp THEN 1 ELSE 0 END)
           OVER (PARTITION BY category, iou_threshold
                 ORDER BY score DESC, conv_id, turn_idx, span_begin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp
  FROM m
),
interp AS (
  SELECT r.category, r.iou_threshold, g.n_gt, r.rk,
         r.ctp::DOUBLE / g.n_gt AS recall,
         max(r.ctp::DOUBLE / r.rk)
           OVER (PARTITION BY r.category, r.iou_threshold ORDER BY r.rk
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS p_interp
  FROM ranked r JOIN ngt g USING (category)
),
grid AS (SELECT (i / 100.0)::DOUBLE AS r FROM range(0, 101) AS u(i)),
keys AS (SELECT DISTINCT category, iou_threshold, n_gt FROM interp),
contrib AS (
  SELECT k.category, k.iou_threshold, k.n_gt, grid.r,
         max(CASE WHEN i.recall >= grid.r THEN i.p_interp END) AS p_at_r
  FROM keys k CROSS JOIN grid
  LEFT JOIN interp i ON i.category = k.category AND i.iou_threshold = k.iou_threshold
  GROUP BY 1, 2, 3, 4
)
SELECT category, iou_threshold, n_gt,
       sum(coalesce(p_at_r, 0)::DECIMAL(20,10))::DOUBLE / 101 AS ap
FROM contrib GROUP BY 1, 2, 3
"""


@register("eval_coco_map", oracle_coco_map())
def q_eval_coco_map(spark, sf_dir):
    return eval_coco_map(spark, _gt(spark, sf_dir))
