"""Sitemap urlset parsing + discovery diff (operators/webcrawl)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.operators.webcrawl import (
    sitemap_discover,
    sitemap_entries,
    synth_sitemaps,
)


def test_optional_fields_null_and_priority_pct(spark):
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <url><loc>https://a.org/p/1</loc><lastmod>2026-02-03</lastmod>"
        "<priority>0.7</priority></url>\n"
        "  <url><loc>https://a.org/p/2</loc></url>\n"
        "</urlset>\n"
    )
    sm = spark.createDataFrame([("a.org", xml)], "host string, xml string")
    rows = {r["loc"]: r for r in sitemap_entries(sm).collect()}
    assert rows["https://a.org/p/1"]["lastmod"] == "2026-02-03"
    assert rows["https://a.org/p/1"]["priority_pct"] == 70
    assert rows["https://a.org/p/2"]["lastmod"] is None
    assert rows["https://a.org/p/2"]["priority_pct"] is None


def test_discover_flags_only_frontier_urls_known(spark):
    sm = spark.createDataFrame(
        [("a.org",
          "<urlset>\n"
          "  <url><loc>https://a.org/p/1</loc></url>\n"
          "  <url><loc>https://a.org/p/9</loc></url>\n"
          "</urlset>")],
        "host string, xml string",
    )
    frontier = spark.createDataFrame([("https://a.org/p/1",)], "url string")
    out = {r["loc"]: r["known"]
           for r in sitemap_discover(sitemap_entries(sm), frontier).collect()}
    assert out == {"https://a.org/p/1": True, "https://a.org/p/9": False}


def test_synth_round_trip_counts(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    n_docs = docs.count()
    n_ghosts = docs.where(F.col("doc_id") % 5 == 0).count()
    ents = sitemap_entries(synth_sitemaps(docs))
    assert ents.count() == n_docs + n_ghosts
    assert ents.where(F.col("loc") == "").count() == 0


def test_parse_plan_is_jvm_only(spark):
    sm = spark.createDataFrame([("a.org", "<urlset></urlset>")],
                               "host string, xml string")
    plan = sitemap_entries(sm)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_priority_full_range_and_rounding(spark):
    xml = ("<urlset>"
           "<url><loc>https://a.org/1</loc><priority>1.0</priority></url>\n"
           "<url><loc>https://a.org/2</loc><priority>0.85</priority></url>\n"
           "<url><loc>https://a.org/3</loc><priority>0.29</priority></url>\n"
           "</urlset>")
    sm = spark.createDataFrame([("a.org", xml)], "host string, xml string")
    out = {r["loc"]: r["priority_pct"] for r in sitemap_entries(sm).collect()}
    assert out == {"https://a.org/1": 100, "https://a.org/2": 85,
                   "https://a.org/3": 29}
