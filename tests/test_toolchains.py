"""Tool-chain n-grams and retry-run (gaps-and-islands) analytics over agent
transcripts (operators/transcriptstats.py). End-to-end parity vs DuckDB is
the tool_chain_ngrams / tool_retry_runs oracle rows; these pin semantics on
hand-built conversations."""

from __future__ import annotations

from deepdoctection_spark.operators.transcriptstats import (
    tool_chain_ngrams,
    tool_retry_runs,
)


def _tx(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )


def test_chain_ngrams_slide_and_support(spark):
    # conv a tools in turn order: s > b > p > s ; conv b: s > b > p
    rows = [
        ("a", 0, "user", ""),
        ("a", 1, "tool", "s"),
        ("a", 2, "tool", "b"),
        ("a", 3, "assistant", ""),
        ("a", 4, "tool", "p"),
        ("a", 5, "tool", "s"),
        ("b", 0, "tool", "s"),
        ("b", 1, "tool", "b"),
        ("b", 2, "tool", "p"),
    ]
    got = {
        r["chain"]: (r["n_occurrences"], r["n_convs"])
        for r in tool_chain_ngrams(_tx(spark, rows), n=3).collect()
    }
    assert got == {"s>b>p": (2, 2), "b>p>s": (1, 1)}


def test_chain_ngrams_short_conversations_dropped(spark):
    rows = [("a", 0, "tool", "s"), ("a", 1, "tool", "b")]  # only 2 tool turns
    assert tool_chain_ngrams(_tx(spark, rows), n=3).count() == 0


def test_chain_order_is_turn_idx_not_input_order(spark):
    rows = [  # delivered out of order: chain must still be x>y>z
        ("a", 4, "tool", "z"),
        ("a", 0, "tool", "x"),
        ("a", 2, "tool", "y"),
    ]
    (row,) = tool_chain_ngrams(_tx(spark, rows), n=3).collect()
    assert row["chain"] == "x>y>z"


def test_retry_runs_maximal_islands(spark):
    # conv a tool turns: g g g | b | g g  → runs: (g,3,0-2) and (g,2,8-9)
    rows = [
        ("a", 0, "tool", "g"),
        ("a", 1, "tool", "g"),
        ("a", 2, "tool", "g"),
        ("a", 3, "user", ""),
        ("a", 5, "tool", "b"),
        ("a", 8, "tool", "g"),
        ("a", 9, "tool", "g"),
    ]
    got = {
        (r["conv_id"], r["start_turn"]): (r["tool"], r["run_len"], r["end_turn"])
        for r in tool_retry_runs(_tx(spark, rows), min_len=2).collect()
    }
    # non-tool turns are transparent: the single 'b' breaks the g-run
    assert got == {("a", 0): ("g", 3, 2), ("a", 8): ("g", 2, 9)}


def test_retry_runs_do_not_cross_conversations(spark):
    rows = [("a", 0, "tool", "g"), ("b", 1, "tool", "g")]
    assert tool_retry_runs(_tx(spark, rows), min_len=2).count() == 0


def test_response_latency_counts_only_direct_replies(spark):
    import datetime as dt

    from deepdoctection_spark.operators.transcriptstats import (
        response_latency,
    )

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda c, i, role, secs: (c, i, role, "x", "", t0 + dt.timedelta(seconds=secs))  # noqa: E731
    rows = [
        # conv a: two direct replies, 10s then 30s
        mk("a", 0, "user", 0), mk("a", 1, "assistant", 10),
        mk("a", 2, "user", 100), mk("a", 3, "assistant", 130),
        # conv b: tool turn mediates -> NOT a direct reply edge
        mk("b", 0, "user", 0), mk("b", 1, "tool", 5),
        mk("b", 2, "assistant", 9),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")
    out = {r.conv_id: r for r in response_latency(df).collect()}
    a = out["a"]
    assert (a.n_exchanges, a.sum_latency_sec, a.max_latency_sec,
            a.mean_latency_milli) == (2, 40, 30, 20000)
    assert "b" not in out   # mediated reply only -> no direct edge
