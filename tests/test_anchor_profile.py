"""Anchor-text profile (operators/graph.anchor_text_profile)."""

from __future__ import annotations

from deepdoctection_spark.operators.graph import anchor_text_profile


def test_topk_order_ties_and_indegree(spark):
    links = spark.createDataFrame(
        [(s, "d1", a) for s, a in
         [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y"), (6, "z"), (7, "a")]]
        + [(8, "d2", "solo")],
        "src long, dst string, anchor string",
    )
    rows = anchor_text_profile(links, k=3).collect()
    d1 = sorted((r for r in rows if r["dst"] == "d1"), key=lambda r: r["rank"])
    assert [(r["anchor"], r["n"]) for r in d1] == [("x", 3), ("y", 2), ("a", 1)]
    assert all(r["dst_indegree"] == 7 for r in d1)  # k cuts ranks, not totals
    (d2,) = [r for r in rows if r["dst"] == "d2"]
    assert (d2["rank"], d2["anchor"], d2["dst_indegree"]) == (1, "solo", 1)


def test_single_exchange_over_aggregated_table(spark):
    links = spark.createDataFrame(
        [(1, "d", "a")], "src long, dst string, anchor string"
    )
    plan = (
        anchor_text_profile(links)._jdf.queryExecution().executedPlan().toString()
    )
    # one shuffle for the (dst, anchor) agg; windows reuse dst partitioning
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
