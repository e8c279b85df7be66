"""Deterministic noisy-proposal synthesis for the matching+NMS path.

The reference's central assignment semantics (MatchingService: child→parent
IoA-argmax assignment, /root/reference/deepdoctection/pipe/common.py:76-168;
AnnotationNmsService: greedy score-descending suppression,
pipe/common.py:239-301) run on *detector proposals* — overlapping, scored,
imperfect. The sandbox has no detector, so this module is the
DetectResultGenerator analogue
(/root/reference/deepdoctection/pipe/sub_layout.py:38-258): it synthesizes a
deterministic set of overlapping scored proposals around each true block span,
plus probe child spans, so the real NMS + matching kernels execute end-to-end
on genuinely-overlapping input and a SQL oracle can derive the expected
survivors/assignments analytically.

Geometry per true block [b, e), L = e - b (all offsets integer, L ≥ 5 for
the analysis below; the kernels themselves are general):

Candidates (cand_id, interval, score):
  0: [b, e)                      0.90  the true block — always survives NMS
  1: [b, b + ceil(0.8 L))        0.70  near-duplicate: IoU vs c0 ≥ 0.8 → always
                                       suppressed
  2: [b + L//2, e)               0.80  right half: IoU vs c0 = ceil(L/2)/L —
                                       exactly 0.5 when L even (NOT > thr →
                                       kept), > 0.5 when L odd (suppressed):
                                       the strict-inequality boundary case
  3: [b + L//2, e + 1)           0.60  right half + separator: IoU vs c0 ≤ 0.5
                                       always; vs kept c2 (L even) > 0.5 →
                                       suppressed; kept iff L odd

Probe children (child_id, interval) and their expected argmax-IoA assignment
at threshold 0.5 (parents = NMS survivors ordered by (block_no, cand_id);
ties take the first max — np.argmax semantics, matching the reference's
max-parent-only mode):
  0: [b, b + ceil(L/2))   → c0, ioa 1.0 (disjoint from c2; sliver vs c3)
  1: [e-2, e+2)           → L odd: c3, 0.75;  L even: tie c0/c2 at 0.5 → c0
  2: [e, e+1)             → L odd: c3, 1.0;   L even: unmatched (ioa 0)
  3: [e-1, e+2)           → L odd: c3, 2/3;   L even: best 1/3 < thr →
                            unmatched-with-overlap (sub-threshold drop)
plus one per-turn child at [-5, -1): unmatched, zero overlap with anything.

Candidates never cross block boundaries (c3 ends exactly at the next block's
begin), so the oracle needs no cross-block terms; children may touch the next
block's c0 with ioa ≤ 0.25, which can never win the argmax (within-block best
is ≥ 0.5 wherever a child is matched).
"""

from __future__ import annotations

NMS_IOU_THRESHOLD = 0.5
MATCH_IOA_THRESHOLD = 0.5

# (cand_id, score) in fixed order; geometry computed per block
CANDIDATE_SCORES = [0.90, 0.70, 0.80, 0.60]


def candidate_proposals(begin: int, end: int) -> list[tuple[int, int, int, float]]:
    """[(cand_id, begin, end, score)] — deterministic overlapping proposals."""
    L = end - begin
    fl = L // 2
    ceil08 = (4 * L + 4) // 5  # == ceil(0.8 * L) in exact integer arithmetic
    return [
        (0, begin, end, CANDIDATE_SCORES[0]),
        (1, begin, begin + ceil08, CANDIDATE_SCORES[1]),
        (2, begin + fl, end, CANDIDATE_SCORES[2]),
        (3, begin + fl, end + 1, CANDIDATE_SCORES[3]),
    ]


def probe_children(begin: int, end: int) -> list[tuple[int, int, int]]:
    """[(child_id, begin, end)] probe spans for the matching service."""
    ceil_half = (end - begin + 1) // 2
    return [
        (0, begin, begin + ceil_half),
        (1, end - 2, end + 2),
        (2, end, end + 1),
        (3, end - 1, end + 2),
    ]


TURN_PROBE = (-5, -1)  # per-turn always-unmatched child (no overlap possible)
