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


def test_k_anonymity_report_flags_small_classes(spark):
    from deepdoctection_spark.operators.expectations import k_anonymity_report

    rows = (
        # a 6-member class hiding 3 distinct sensitive values -> safe
        [("adult", "city", f"p{i % 3}") for i in range(6)]
        # a 2-member class -> at risk under k=5
        + [("minor", "town", "p9"), ("minor", "town", "p9")]
    )
    df = spark.createDataFrame(rows, "age string, loc string, person string")
    out = {(r.age, r.loc): r for r in k_anonymity_report(
        df, ["age", "loc"], "person", k=5).collect()}
    safe, risky = out[("adult", "city")], out[("minor", "town")]
    assert (safe.class_n, safe.l_div, safe.at_risk) == (6, 3, 0)
    assert (risky.class_n, risky.l_div, risky.at_risk) == (2, 1, 1)


def test_k_anonymity_partitioning_invariance(spark):
    from deepdoctection_spark.operators.expectations import k_anonymity_report

    df = spark.createDataFrame(
        [(f"a{i % 4}", f"s{i % 7}") for i in range(100)], "qi string, s string"
    )
    a = sorted(map(tuple, k_anonymity_report(df.coalesce(1), ["qi"], "s").collect()))
    b = sorted(map(tuple, k_anonymity_report(df.repartition(16), ["qi"], "s").collect()))
    assert a == b
