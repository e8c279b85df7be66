"""Span matching + non-maximum suppression on 1-D char intervals.

Re-expression of the reference's geometry services on character offsets:
- MatchingService: assign child spans to parent spans by pairwise
  intersection-over-area ≥ threshold, optionally argmax-parent-only
  (/root/reference/deepdoctection/pipe/common.py:76-168;
  kernel /root/reference/deepdoctection/mapper/match.py:34-166).
- AnnotationNmsService: greedy score-descending suppression of overlapping
  spans (/root/reference/deepdoctection/pipe/common.py:239-301).

Everything is vectorized numpy over the (N parents × M children) matrix —
row-local inside a turn, so no Spark shuffle is ever needed (spans never cross
a turn boundary).
"""

from __future__ import annotations

import numpy as np


def interval_ioa(parents: np.ndarray, children: np.ndarray) -> np.ndarray:
    """Pairwise intersection-over-child-area for 1-D intervals.

    parents: (N, 2) [begin, end); children: (M, 2). Returns (N, M) matrix of
    |p ∩ c| / |c| — the reference's ioa on boxes
    (/root/reference/deepdoctection/mapper/match.py:30,138)."""
    if len(parents) == 0 or len(children) == 0:
        return np.zeros((len(parents), len(children)))
    lo = np.maximum(parents[:, None, 0], children[None, :, 0])
    hi = np.minimum(parents[:, None, 1], children[None, :, 1])
    inter = np.clip(hi - lo, 0, None).astype(np.float64)
    area = np.clip(children[:, 1] - children[:, 0], 1e-9, None).astype(np.float64)
    return inter / area[None, :]


def match_children(
    parents: np.ndarray,
    children: np.ndarray,
    threshold: float = 0.5,
    max_parent_only: bool = True,
) -> list[tuple[int, int]]:
    """(parent_idx, child_idx) assignments with ioa ≥ threshold.

    max_parent_only keeps only the argmax parent per child (the reference's
    max_parent_only mode, pipe/common.py:129-141)."""
    m = interval_ioa(parents, children)
    if m.size == 0:
        return []
    if max_parent_only:
        best = m.argmax(axis=0)
        return [
            (int(best[j]), j)
            for j in range(m.shape[1])
            if m[best[j], j] >= threshold
        ]
    pi, ci = np.where(m >= threshold)
    return list(zip(pi.tolist(), ci.tolist()))


def interval_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU for 1-D intervals (box.py:43-142 semantics on offsets)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lo = np.maximum(a[:, None, 0], b[None, :, 0])
    hi = np.minimum(a[:, None, 1], b[None, :, 1])
    inter = np.clip(hi - lo, 0, None).astype(np.float64)
    la = np.clip(a[:, 1] - a[:, 0], 0, None).astype(np.float64)
    lb = np.clip(b[:, 1] - b[:, 0], 0, None).astype(np.float64)
    union = la[:, None] + lb[None, :] - inter
    return inter / np.clip(union, 1e-9, None)


def nms_spans(spans: np.ndarray, scores: np.ndarray, iou_threshold: float = 0.5) -> list[int]:
    """Greedy NMS: keep indices of survivors, score-descending with
    deterministic (score desc, begin asc) tie-break."""
    if len(spans) == 0:
        return []
    order = np.lexsort((spans[:, 0], -scores))
    iou = interval_iou(spans, spans)
    keep: list[int] = []
    suppressed = np.zeros(len(spans), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        suppressed |= iou[i] > iou_threshold
        suppressed[i] = False  # re-clear self; it is kept, not suppressed
    return sorted(keep)
