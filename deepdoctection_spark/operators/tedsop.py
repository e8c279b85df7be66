"""TEDS scoring operator: batch tree-edit similarity over HTML pairs.

The reference streams (gt, pred) HTML pairs into a multiprocessing pool
(/root/reference/deepdoctection/eval/tedsmetric.py:191-265); here the pairs
are a DataFrame and the scorer is an Arrow-batched stage — the pool is the
cluster."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from deepdoctection_spark.kernels.teds import teds

TEDS_SCHEMA = "conv_id string, turn_idx int, teds double"


def teds_scores(pairs: DataFrame) -> DataFrame:
    """pairs(conv_id, turn_idx, gt_html, pred_html) → per-row TEDS in [0,1].

    Row-local (tables are small trees); narrow stage, no shuffle."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(g, p):
            if g is None or p is None:
                return None
            try:
                return round(teds(g, p), 6)
            except Exception:  # oversized/poison trees → null, never a task kill
                return None

        for pdf in batches:
            out = [
                one(g, p)
                for g, p in zip(pdf["gt_html"].tolist(), pdf["pred_html"].tolist())
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].tolist(),
                    "turn_idx": pd.array(pdf["turn_idx"].tolist(), dtype="int32"),
                    "teds": out,
                }
            )

    return pairs.select("conv_id", "turn_idx", "gt_html", "pred_html").mapInPandas(
        score, schema=TEDS_SCHEMA
    )
