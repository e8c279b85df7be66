"""PageRank integer power iteration + link-harvest invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    PR_SCALE,
    pagerank,
)
import deepdoctection_spark.plans.pipeline  # noqa: F401 — registers extract_links
from deepdoctection_spark.plans.registry import QUERIES


def _python_pagerank(n: int, iters: int) -> dict[int, int]:
    """Serial replay of the exact integer contract."""
    edges = []
    for s in range(n):
        outdeg = s % 3 + 1
        for k in range(1, outdeg + 1):
            edges.append((s, outdeg, (s * 7 + k) % n))
    r = {v: PR_SCALE // n for v in range(n)}
    tele = (15 * PR_SCALE) // (100 * n)
    for _ in range(iters):
        inflow = {v: 0 for v in range(n)}
        for s, outdeg, d in edges:
            inflow[d] += r[s] // outdeg
        r = {v: tele + (DAMP_NUM * inflow[v]) // DAMP_DEN for v in range(n)}
    return r


def test_pagerank_matches_serial_replay(spark):
    docs = spark.createDataFrame(
        [(i, "x", "en") for i in range(37)], "doc_id long, text string, lang string"
    )
    got = {r.doc_id: r.pr_nano for r in pagerank(docs, iters=5).collect()}
    assert got == _python_pagerank(37, 5)


def test_pagerank_mass_and_partitioning(spark, sf_parity):
    docs = spark.read.parquet(f"{sf_parity}/documents.parquet")
    out = pagerank(docs).agg(
        F.sum("pr_nano").alias("mass"), F.count("*").alias("n")
    ).collect()[0]
    assert out.n == docs.count()
    # floor-division leak is bounded by iterations · (edges + nodes) units
    assert 0 <= PR_SCALE - out.mass < 5 * (3 * out.n + out.n)
    a = {r.doc_id: r.pr_nano for r in pagerank(docs.repartition(3)).collect()}
    b = {r.doc_id: r.pr_nano for r in pagerank(docs.repartition(29)).collect()}
    assert a == b


def test_extract_links_template_contract(spark, sf_small):
    out = QUERIES["extract_links"](spark, sf_small)
    rows = out.collect()
    per_turn: dict[tuple, list] = {}
    for r in rows:
        per_turn.setdefault((r.conv_id, r.turn_idx), []).append(r)
    for key, links in per_turn.items():
        links.sort(key=lambda r: r.link_pos)
        assert [r.href for r in links] == ["/", "/about", "/contact", "/p", "/t", "/i"]
        assert [r.anchor for r in links] == [
            "Home", "About", "Contact", "Privacy", "Terms", "Imprint"
        ]
    # only browser turns (doc_id % 3 == 1) carry links: one 6-link group per
    # browser doc, nothing from plain-text or pdf_reader turns
    n_browser = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .where("doc_id % 3 = 1")
        .count()
    )
    assert len(per_turn) == n_browser
    assert len(rows) == 6 * n_browser
