"""Frontier politeness scheduling (operators/webcrawl.robots_delays /
frontier_schedule): Crawl-delay group semantics, the default path, per-host
slotting and host-affine fetcher sharding."""

from __future__ import annotations

from deepdoctection_spark.operators.webcrawl import frontier_schedule, robots_delays


def _schedule(spark, robots_rows, url_rows, **kw):
    robots = spark.createDataFrame(robots_rows, "host string, robots_txt string")
    urls = spark.createDataFrame(
        url_rows, "doc_id long, host string, path string, priority int"
    )
    return frontier_schedule(urls, robots_delays(robots), **kw).collect()


def test_delay_group_semantics_and_max_wins(spark):
    rows = _schedule(
        spark,
        [
            # foreign-agent delay must not leak; * group: max(2, 5) wins
            ("a.org", "User-agent: evilbot\nCrawl-delay: 99\n\n"
                      "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 5\n"),
            # no * Crawl-delay at all -> scheduler default
            ("b.org", "User-agent: *\nDisallow:\n"),
        ],
        [(1, "a.org", "/x", 0), (2, "b.org", "/y", 0)],
        default_delay_ms=700,
    )
    d = {r["host"]: r for r in rows}
    assert d["a.org"]["delay_ms"] == 5000
    assert d["b.org"]["delay_ms"] == 700


def test_slots_rank_by_priority_then_path(spark):
    rows = _schedule(
        spark,
        [("a.org", "User-agent: *\nCrawl-delay: 3\n")],
        [
            (1, "a.org", "/low", 1),
            (2, "a.org", "/hi", 9),
            (3, "a.org", "/mid-b", 5),
            (4, "a.org", "/mid-a", 5),  # tie -> path ascending
        ],
    )
    order = [r["path"] for r in sorted(rows, key=lambda r: r["slot"])]
    assert order == ["/hi", "/mid-a", "/mid-b", "/low"]
    by_path = {r["path"]: r for r in rows}
    assert by_path["/hi"]["fetch_at_ms"] == 0
    assert by_path["/low"]["fetch_at_ms"] == 3 * 3000


def test_fetcher_is_host_affine_and_bounded(spark):
    rows = _schedule(
        spark,
        [("a.org", "User-agent: *\n"), ("b.org", "User-agent: *\n")],
        [(i, "a.org" if i % 2 else "b.org", f"/p/{i}", i) for i in range(10)],
        n_fetchers=4,
    )
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host"], set()).add(r["fetcher"])
        assert 0 <= r["fetcher"] < 4
    assert all(len(s) == 1 for s in per_host.values())
