"""robots.txt parsing + RFC 9309 longest-match filtering (operators/webcrawl)."""

from __future__ import annotations

from deepdoctection_spark.operators.webcrawl import robots_filter, robots_rules


def _verdicts(spark, robots_txt: str, paths: list[str]) -> dict[str, tuple]:
    robots = spark.createDataFrame(
        [("h.org", robots_txt)], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [(i, "h.org", p) for i, p in enumerate(paths)],
        "doc_id long, host string, path string",
    )
    out = robots_filter(urls, robots_rules(robots)).collect()
    return {r["path"]: (r["allowed"], r["matched_prefix"]) for r in out}


def test_foreign_agent_group_does_not_leak(spark):
    txt = "User-agent: evilbot\nDisallow: /\n\nUser-agent: *\nDisallow: /x\n"
    v = _verdicts(spark, txt, ["/x/1", "/y/1"])
    assert v["/x/1"] == (False, "/x")
    assert v["/y/1"] == (True, None)  # evilbot's Disallow: / must not apply


def test_longest_match_wins_and_allow_breaks_ties(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/ok\n"        # longer -> overrides
        "Disallow: /b/1\n"
        "Allow: /b/2\n"         # same length as a hypothetical tie below
        "Disallow: /t/x\n"
        "Allow: /t/x\n"         # exact tie -> Allow wins
    )
    v = _verdicts(spark, txt, ["/a/no", "/a/ok/deep", "/t/x/page"])
    assert v["/a/no"] == (False, "/a")
    assert v["/a/ok/deep"] == (True, "/a/ok")
    assert v["/t/x/page"] == (True, "/t/x")


def test_noise_lines_and_case_insensitive_directives(spark):
    txt = (
        "# comment\n"
        "\n"
        "USER-AGENT: *\n"
        "DISALLOW: /q\n"
        "Disallow:\n"           # empty path: matches nothing (spec)
        "allow: /q/z\n"
    )
    v = _verdicts(spark, txt, ["/q/a", "/q/z", "/other"])
    assert v["/q/a"] == (False, "/q")
    assert v["/q/z"] == (True, "/q/z")
    assert v["/other"] == (True, None)


def test_host_isolation(spark):
    robots = spark.createDataFrame(
        [("a.org", "User-agent: *\nDisallow: /\n"), ("b.org", "User-agent: *\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(0, "a.org", "/p"), (1, "b.org", "/p"), (2, "c.org", "/p")],
        "doc_id long, host string, path string",
    )
    out = {r["host"]: r["allowed"]
           for r in robots_filter(urls, robots_rules(robots)).collect()}
    assert out == {"a.org": False, "b.org": True, "c.org": True}
