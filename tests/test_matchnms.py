"""Matching + NMS production path: deterministic proposal geometry through
the real kernels (pure Python — the Spark/oracle end-to-end check is the
match_nms_candidates / match_assignments rows of the parity gate)."""

from __future__ import annotations

import numpy as np

from deepdoctection_spark.kernels.match import interval_ioa, match_children, nms_spans
from deepdoctection_spark.kernels.noisy import (
    MATCH_IOA_THRESHOLD,
    NMS_IOU_THRESHOLD,
    candidate_proposals,
    probe_children,
)


def _survivor_ids(begin: int, end: int) -> set[int]:
    cands = candidate_proposals(begin, end)
    spans = np.array([[c[1], c[2]] for c in cands], dtype=np.float64)
    scores = np.array([c[3] for c in cands], dtype=np.float64)
    return {cands[i][0] for i in nms_spans(spans, scores, NMS_IOU_THRESHOLD)}


def test_nms_survivors_even_length():
    # L even: c2's IoU vs c0 is exactly 0.5 — NOT suppressed (strict >);
    # c3 then overlaps kept c2 above threshold and is suppressed.
    assert _survivor_ids(10, 30) == {0, 2}


def test_nms_survivors_odd_length():
    # L odd: c2 suppressed by c0 (IoU > 0.5); c3 survives (IoU vs c0 = 0.5).
    assert _survivor_ids(10, 31) == {0, 3}


def test_near_duplicate_always_suppressed():
    for L in (5, 8, 13, 100):
        assert 1 not in _survivor_ids(0, L)


def test_probe_assignments_odd():
    b, e = 0, 21  # L = 21 odd → survivors c0=[0,21), c3=[10,22)
    cands = candidate_proposals(b, e)
    spans = np.array([[c[1], c[2]] for c in cands], dtype=np.float64)
    scores = np.array([c[3] for c in cands], dtype=np.float64)
    keep = sorted(nms_spans(spans, scores, NMS_IOU_THRESHOLD))
    parents = np.array([[cands[i][1], cands[i][2]] for i in keep], dtype=np.float64)
    kids = probe_children(b, e)
    carr = np.array([[c[1], c[2]] for c in kids], dtype=np.float64)
    got = dict(
        (ci, cands[keep[pi]][0])
        for pi, ci in match_children(parents, carr, MATCH_IOA_THRESHOLD)
    )
    # ch0 → c0; ch1/ch2/ch3 → c3
    assert got == {0: 0, 1: 3, 2: 3, 3: 3}
    m = interval_ioa(parents, carr)
    np.testing.assert_allclose(m.max(axis=0), [1.0, 0.75, 1.0, 2 / 3])


def test_probe_assignments_even():
    b, e = 0, 20  # L = 20 even → survivors c0=[0,20), c2=[10,20)
    cands = candidate_proposals(b, e)
    spans = np.array([[c[1], c[2]] for c in cands], dtype=np.float64)
    scores = np.array([c[3] for c in cands], dtype=np.float64)
    keep = sorted(nms_spans(spans, scores, NMS_IOU_THRESHOLD))
    parents = np.array([[cands[i][1], cands[i][2]] for i in keep], dtype=np.float64)
    kids = probe_children(b, e)
    carr = np.array([[c[1], c[2]] for c in kids], dtype=np.float64)
    got = dict(
        (ci, cands[keep[pi]][0])
        for pi, ci in match_children(parents, carr, MATCH_IOA_THRESHOLD)
    )
    # ch1 ties c0/c2 at 0.5 → first max (c0); ch2/ch3 below threshold
    assert got == {0: 0, 1: 0}
    m = interval_ioa(parents, carr)
    np.testing.assert_allclose(m.max(axis=0), [1.0, 0.5, 0.0, 1 / 3])


def test_spark_operator_shapes(spark):
    from deepdoctection_spark.operators.extraction import extract_transcripts
    from deepdoctection_spark.operators.matchnms import (
        noisy_assignments,
        noisy_candidates,
    )
    from deepdoctection_spark.sources.transcripts import build_transcripts

    ex = extract_transcripts(
        build_transcripts(spark, "/root/testdata/sf0.001"), with_words=False
    )
    cand = noisy_candidates(ex)
    asg = noisy_assignments(ex)
    n_turns = ex.count()
    # 4 candidates per block; 4 probes per block + 1 per turn
    n_blocks = cand.where("cand_id = 0").count()
    assert cand.count() == 4 * n_blocks
    assert asg.count() == 4 * n_blocks + n_turns
    # kept flags: c0 always kept, c1 never
    assert cand.where("cand_id = 0 AND NOT kept").count() == 0
    assert cand.where("cand_id = 1 AND kept").count() == 0


def test_poison_turn_dropped_not_fatal(spark):
    # a malformed blocks payload (negative spans of inconsistent types) must
    # be quarantined (dropped), not fail the task
    import pandas as pd

    from deepdoctection_spark.operators.matchnms import noisy_candidates

    good = {"span_id": "s", "category": "text", "span_begin": 0,
            "span_end": 40, "reading_order": 0, "parent_id": None, "score": 1.0}
    bad = dict(good, span_begin=None, span_end=None)  # None begin/end → TypeError
    df = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["a", "b"], "turn_idx": [0, 1],
                      "blocks": [[good], [bad]]})
    )
    out = noisy_candidates(df).collect()
    convs = {r["conv_id"] for r in out}
    assert convs == {"a"}  # poison turn dropped, good turn processed
