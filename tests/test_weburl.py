"""Canonical-URL normalization (operators/weburl.py): hand-computed cases.

The corpus-scale differential lives in the dedup_url_canonical oracle row;
here every normalization rule gets a minimal pinned example.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.operators.weburl import canonical_url, url_dedup

CASES = [
    # (raw, canonical)
    ("https://example.com/a", "https://example.com/a"),
    ("HTTPS://WWW.Example.COM/a/", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a?utm_source=x&b=2&a=1#frag",
     "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&utm_campaign=y",
     "https://example.com/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com///", "https://example.com/"),
    ("https://example.com/#only-frag", "https://example.com/"),
    # www stripped only as a label prefix, not inside the host
    ("https://wwwx.example.com/a", "https://wwwx.example.com/a"),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, raw string"
    )
    got = {
        r["i"]: r["canon"]
        for r in df.select(
            "i", canonical_url(F.col("raw")).alias("canon")
        ).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_dedup_verdicts(spark):
    rows = [
        (1, "https://example.com/a"),
        (2, "HTTPS://WWW.Example.COM/a/"),
        (3, "https://example.com:443/a?utm_source=x"),
        (4, "https://example.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, raw_url string")
    out = {r["doc_id"]: r.asDict() for r in url_dedup(df).collect()}
    assert out[1]["is_canonical_rep"] and out[1]["n_variants"] == 3
    assert not out[2]["is_canonical_rep"] and not out[3]["is_canonical_rep"]
    assert out[4]["is_canonical_rep"] and out[4]["n_variants"] == 1
    assert (
        out[1]["canonical_url"]
        == out[2]["canonical_url"]
        == out[3]["canonical_url"]
        == "https://example.com/a"
    )


def test_host_quota_sample_deterministic(spark):
    from deepdoctection_spark.operators.weburl import host_quota_sample

    rows = [(i, f"h{i % 2}.org") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, host string")
    a = host_quota_sample(df, k=3)
    b = host_quota_sample(df.repartition(7), k=3)
    got_a = sorted((r["host"], r["doc_id"]) for r in a.collect())
    got_b = sorted((r["host"], r["doc_id"]) for r in b.collect())
    assert got_a == got_b and len(got_a) == 6  # 3 per host, partition-stable
    per_host = {}
    for h, i in got_a:
        per_host.setdefault(h, []).append(i)
    assert all(len(v) == 3 for v in per_host.values())


def test_page_directives_variants(spark):
    from deepdoctection_spark.operators.weburl import page_directives

    rows = [
        ("u1", '<head><META NAME="robots" CONTENT="NOINDEX"></head>'),
        ("u2", "<head><meta name='robots' content='nofollow, noarchive'>"
               "</head>"),
        ("u3", '<head><link rel="canonical" href="https://c/x"></head>'),
        ("u4", '<head><meta name="viewport" content="noindex"></head>'),
        ("u5", "<head>plain</head>"),
        ("u6", '<head><meta name="robots" content="none-of-those">'
               '<link rel=\'canonical\' href=\'https://c/y\'></head>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r.url: r for r in page_directives(df).collect()}
    assert (out["u1"].noindex, out["u1"].nofollow) == (1, 0)
    assert (out["u2"].noindex, out["u2"].nofollow) == (0, 1)
    assert out["u3"].canonical == "https://c/x" and out["u3"].noindex == 0
    # a non-robots meta must never trip the verdict
    assert (out["u4"].noindex, out["u4"].nofollow) == (0, 0)
    assert out["u5"].canonical is None
    assert (out["u6"].noindex, out["u6"].nofollow,
            out["u6"].canonical) == (0, 0, "https://c/y")
