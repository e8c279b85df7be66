"""Pointer-doubling redirect resolution (operators/weburl.resolve_redirects)."""

from __future__ import annotations

from deepdoctection_spark.operators.weburl import resolve_redirects


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["src"]: r for r in resolve_redirects(df, **kw).collect()}


def test_long_chain_resolves_with_log_rounds(spark):
    # chain u0 -> u1 -> ... -> u20 (20 hops, needs 5 doubling rounds)
    edges = [(f"u{i}", f"u{i+1}") for i in range(20)]
    out = _resolve(spark, edges, max_hops=32)
    assert out["u0"]["final_url"] == "u20"
    assert out["u0"]["hops"] == 20
    assert all(r["resolved"] for r in out.values())
    assert out["u19"]["hops"] == 1


def test_loop_flagged_unresolved_and_tail_into_loop(spark):
    edges = [("a", "b"), ("b", "a"), ("t", "a"), ("x", "y")]
    out = _resolve(spark, edges)
    assert out["a"]["resolved"] is False
    assert out["b"]["resolved"] is False
    assert out["t"]["resolved"] is False  # tail entering a loop never exits
    assert out["x"]["resolved"] is True and out["x"]["final_url"] == "y"


def test_branching_into_shared_terminal(spark):
    edges = [("p", "z"), ("q", "z"), ("r", "q")]
    out = _resolve(spark, edges)
    assert out["p"]["final_url"] == "z" and out["p"]["hops"] == 1
    assert out["r"]["final_url"] == "z" and out["r"]["hops"] == 2
