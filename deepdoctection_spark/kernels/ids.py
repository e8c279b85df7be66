"""Deterministic, content-addressed span identity.

Reference semantics: annotation_id = md5 over defining attributes plus the
container context (/root/reference/deepdoctection/datapoint/annotation.py:154-169,
image.py:440-451) — ids are reproducible functions of (category, box, page id),
which makes re-runs idempotent and parity testable. We keep exactly that
contract on character-offset spans:

    span_id = md5("{conv_id}|{turn_idx}|{category}|{begin}|{end}")

The same value is reproducible in any SQL engine as
``md5(conv_id || '|' || turn_idx || '|' || category || '|' || begin || '|' || end)``,
which is what the DuckDB correctness oracles use.
"""

from __future__ import annotations

import hashlib


def span_id(conv_id: str, turn_idx: int, category: str, begin: int, end: int) -> str:
    key = f"{conv_id}|{turn_idx}|{category}|{begin}|{end}"
    return hashlib.md5(key.encode("utf-8")).hexdigest()
