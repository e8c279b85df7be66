"""Data-validation expectations (operators/expectations.py). End-to-end
parity with planted corpus corruptions is the data_expectations oracle row;
these pin each rule on hand-built rows."""

from __future__ import annotations

import datetime as dt

from deepdoctection_spark.operators.expectations import transcript_expectations

_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def _report(spark, rows):
    return {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in transcript_expectations(_t(spark, rows)).collect()
    }


def _clean():
    return [
        ("a", 0, "user", "hi", _TS),
        ("a", 1, "assistant", "yo", _TS + dt.timedelta(seconds=30)),
        ("b", 0, "tool", "r", _TS),
    ]


def test_clean_table_passes_all_rules(spark):
    rep = _report(spark, _clean())
    assert len(rep) == 7
    assert all(v == (0, True) for v in rep.values())


def test_each_corruption_detected(spark):
    rep = _report(spark, _clean() + [
        (None, 0, "user", "x", _TS),                 # null conv
        ("c", -2, "user", "x", _TS),                 # negative + non-contig
        # duplicate (a,1) — same ts as the original so the tie adds no
        # order-dependent monotonicity violation
        ("a", 1, "assistant", "dup", _TS + dt.timedelta(seconds=30)),
        ("d", 0, "system", "x", _TS),                # bad role
        ("e", 0, "user", None, _TS),                 # null text
        ("f", 0, "user", "x", _TS),                  # f: ts goes backwards
        ("f", 1, "user", "y", _TS - dt.timedelta(hours=1)),
    ])
    assert rep["conv_id_not_null"] == (1, False)
    assert rep["turn_idx_nonnegative"] == (1, False)
    assert rep["role_in_domain"] == (1, False)
    assert rep["text_not_null"] == (1, False)
    assert rep["turn_unique"] == (1, False)
    assert rep["turn_idx_contiguous"][0] == 1 and not rep["turn_idx_contiguous"][1]
    assert rep["ts_monotone_nondecreasing"] == (1, False)


def test_gap_in_turn_idx_is_noncontiguous(spark):
    rows = [("a", 0, "user", "x", _TS), ("a", 2, "user", "y", _TS)]
    assert _report(spark, rows)["turn_idx_contiguous"] == (1, False)
