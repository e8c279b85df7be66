"""Temporal joins (operators/temporal.py): as-of semantics (latest prior
row, tie handling, strict mode, missing-match nulls) and bucketed interval
range join (boundary inclusivity, bucket-spanning intervals, plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.operators.temporal import (
    asof_join,
    range_join_intervals,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_latest_prior_and_nulls(spark):
    left = _df(spark, [(1, 100, "a"), (1, 205, "b"), (2, 50, "c")],
               "k int, ts int, tag string")
    right = _df(spark, [(1, 90, 9.0), (1, 200, 20.0), (1, 300, 30.0),
                        (2, 60, 6.0)],
                "k int, ts int, v double")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    right_payload=["ts", "v"]).orderBy("tag").collect()
    # a@100 -> right@90; b@205 -> right@200; c@50 -> no prior -> nulls
    assert [(r.tag, r.ts_right, r.v_right) for r in out] == [
        ("a", 90, 9.0), ("b", 200, 20.0), ("c", None, None)]


def test_asof_equal_ts_inclusive_vs_strict(spark):
    left = _df(spark, [(1, 100, "x")], "k int, ts int, tag string")
    right = _df(spark, [(1, 100, 1.0), (1, 40, 4.0)], "k int, ts int, v double")
    incl = asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    assert incl[0].v_right == 1.0  # ts_right <= ts_left: the equal row wins
    strict = asof_join(left, right, "k", "ts", "ts", ["v"],
                       strict=True).collect()
    assert strict[0].v_right == 4.0  # ts_right < ts_left only


def test_asof_plan_has_no_join_node(spark):
    left = _df(spark, [(1, 1, "x")], "k int, ts int, tag string")
    right = _df(spark, [(1, 1, 1.0)], "k int, ts int, v double")
    plan = asof_join(left, right, "k", "ts", "ts", ["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" in plan


def test_range_join_boundaries_and_bucket_span(spark):
    # interval [100, 300] with bucket width 100 spans buckets 1,2,3;
    # points at the exact boundaries are INCLUDED, outside excluded
    intervals = _df(spark, [(7, 100, 300, "iv")],
                    "k int, s int, e int, name string")
    points = _df(spark, [(7, 99, "p0"), (7, 100, "p1"), (7, 250, "p2"),
                         (7, 300, "p3"), (7, 301, "p4"), (8, 200, "p5")],
                 "k int, ts int, tag string")
    out = range_join_intervals(points, intervals, on="k", point_ts="ts",
                               start_ts="s", end_ts="e", bucket_width=100)
    assert sorted(r.tag for r in out.collect()) == ["p1", "p2", "p3"]


def test_range_join_no_duplicate_matches(spark):
    # a point inside an interval that spans many buckets matches ONCE
    intervals = _df(spark, [(1, 0, 1000, "wide")],
                    "k int, s int, e int, name string")
    points = _df(spark, [(1, 500, "p")], "k int, ts int, tag string")
    out = range_join_intervals(points, intervals, "k", "ts", "s", "e",
                               bucket_width=10).collect()
    assert len(out) == 1


def test_range_join_plan_is_equi_join(spark):
    intervals = _df(spark, [(1, 0, 10, "i")], "k int, s int, e int, name string")
    points = _df(spark, [(1, 5, "p")], "k int, ts int, tag string")
    plan = range_join_intervals(points, intervals, "k", "ts", "s", "e", 10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_right_ties_deterministic_with_tiebreak(spark):
    """Multiple right rows at the SAME ts: right_tiebreak picks the
    greatest tiebreak value deterministically regardless of partitioning."""
    left = _df(spark, [(1, 100, "x")], "k int, ts int, tag string")
    right = _df(spark, [(1, 50, 1.0), (1, 50, 9.0), (1, 50, 5.0)],
                "k int, ts int, v double").repartition(4)
    out = asof_join(left, right, "k", "ts", "ts", ["v"],
                    right_tiebreak="v").collect()
    assert out[0].v_right == 9.0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="right_payload"):
        asof_join(left, right, "k", "ts", "ts", ["v"], right_tiebreak="zz")


# ---------------------------------------------------------------------------
# funnel + retention cohorts
# ---------------------------------------------------------------------------


def test_funnel_requires_strict_order(spark, tmp_path):
    import datetime as dt

    import deepdoctection_spark.plans.relational  # noqa: F401 — registers
    from deepdoctection_spark.plans.registry import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda u, typ, mins: (u * 100 + mins, t0 + dt.timedelta(minutes=mins),
                               u, typ, 1.0, "{}")  # noqa: E731
    rows = [
        # u1 completes all three in order
        mk(1, "view", 0), mk(1, "click", 10), mk(1, "purchase", 20),
        # u2: purchase BEFORE click -> stops at 2 steps
        mk(2, "view", 0), mk(2, "purchase", 5), mk(2, "click", 10),
        # u3: click only, never viewed -> 0 steps (funnel is ordered)
        mk(3, "click", 0),
        # u4: view then click at the SAME instant is NOT after -> 1 step
        mk(4, "view", 0), mk(4, "click", 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = {r.user_id: r for r in
           QUERIES["events_funnel_steps"](spark, sf).collect()}
    assert out[1].steps_completed == 3
    assert out[1].t1_us < out[1].t2_us < out[1].t3_us
    assert out[2].steps_completed == 2 and out[2].t3_us is None
    assert out[3].steps_completed == 0
    assert out[4].steps_completed == 1
    # monotone staging: a later stage implies every earlier one
    for r in out.values():
        if r.t3_us is not None:
            assert r.t2_us is not None and r.t1_us is not None
        if r.t2_us is not None:
            assert r.t1_us is not None


def test_retention_cohort_matrix(spark, tmp_path):
    import datetime as dt

    import deepdoctection_spark.plans.relational  # noqa: F401 — registers
    from deepdoctection_spark.plans.registry import QUERIES

    t0 = dt.datetime(2024, 1, 1)  # epoch day 19723 (Mon); week boundary safe
    mk = lambda i, u, d: (i, t0 + dt.timedelta(days=d), u, "view", 1.0, "{}")  # noqa: E731
    rows = [
        mk(1, 1, 0), mk(2, 1, 7),   # u1: weeks 0 and 1
        mk(3, 2, 0),                # u2: week 0 only
        mk(4, 3, 14),               # u3: later cohort, week 0 only
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = QUERIES["events_retention_cohorts"](spark, sf).collect()
    m = {(r.cohort_week, r.week_offset): r for r in out}
    c0 = [r for r in out if r.week_offset == 0]
    assert all(r.retained_ppm == 1000000 for r in c0)   # week 0 = 100%
    early = min(r.cohort_week for r in out)
    late = max(r.cohort_week for r in out)
    assert early != late
    assert m[(early, 0)].n_users == 2 and m[(early, 0)].cohort_size == 2
    assert m[(early, 1)].n_users == 1 and m[(early, 1)].retained_ppm == 500000
    assert m[(late, 0)].n_users == 1
    for r in out:
        assert r.n_users <= r.cohort_size


def test_mad_anomaly_flags_exactly_the_planted_spikes(spark):
    import deepdoctection_spark.plans.relational  # noqa: F401 — registers
    from deepdoctection_spark.plans.registry import QUERIES

    rows = QUERIES["events_anomaly_mad"](spark, "/root/testdata/sf0.01").collect()
    assert rows, "no outliers surfaced — planting inert"
    # every planted +500.00 spike is flagged, in every event_type
    import duckdb

    con = duckdb.connect()
    n_total, n_planted = con.execute(
        "SELECT count(*), sum((event_id % 97 = 0)::INT) FROM read_parquet("
        "'/root/testdata/sf0.01/events.parquet')"
    ).fetchone()
    planted = [r for r in rows if r.event_id % 97 == 0]
    assert len(planted) == n_planted
    assert {r.event_type for r in planted} == {
        "view", "click", "purchase", "signup", "error"}
    # the corpus values are heavy-tailed, so the gate legitimately flags
    # natural tail rows too — but they must be far out (beyond the exact
    # integer threshold, rechecked here) and few
    for r in rows:
        assert 2 * r.d2_c * 100000 > 518911 * r.mad4_c
    assert len(rows) < 0.05 * n_total, (len(rows), n_total)
