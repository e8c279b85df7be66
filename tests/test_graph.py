"""PageRank integer power iteration + link-harvest invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepdoctection_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    HITS_SCALE,
    PR_SCALE,
    bfs_levels,
    block_components,
    hits,
    pagerank,
    triangles,
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


def _graph_edges(n: int) -> list[tuple[int, int]]:
    out = []
    for s in range(n):
        for k in range(1, s % 3 + 2):
            out.append((s, (s * 7 + k) % n))
    return out


def test_hits_matches_serial_replay(spark):
    n = 41
    docs = spark.createDataFrame(
        [(i, "x", "en") for i in range(n)], "doc_id long, text string, lang string"
    )
    edges = _graph_edges(n)
    h = {v: HITS_SCALE for v in range(n)}
    a = {}
    for _ in range(3):
        a = {v: 0 for v in range(n)}
        for s, d in edges:
            a[d] += h[s]
        h = {v: 0 for v in range(n)}
        for s, d in edges:
            h[s] += a[d]
    got = {r.doc_id: (r.hub, r.auth) for r in hits(docs).collect()}
    assert got == {v: (h[v], a[v]) for v in range(n)}


def test_components_converge_to_block_minimum(spark):
    n = 38  # deliberately not a multiple of 7: last block is a short path
    docs = spark.createDataFrame(
        [(i, "x", "en") for i in range(n)], "doc_id long, text string, lang string"
    )
    got = {r.doc_id: r.component for r in block_components(docs).collect()}
    assert got == {v: (v // 7) * 7 for v in range(n)}


def test_triangles_match_bruteforce(spark):
    n = 40
    docs = spark.createDataFrame(
        [(i, "x", "en") for i in range(n)], "doc_id long, text string, lang string"
    )
    und = set()
    for v in range(n):
        for d in (v + 1, v + 2) + (((v + 4),) if v % 5 < 2 else ()):
            d %= n
            if d != v:
                und.add((min(v, d), max(v, d)))
    per = {v: 0 for v in range(n)}
    es = sorted(und)
    eset = und
    n_tri = 0
    for x, y in es:
        for y2, z in es:
            if y2 == y and (x, z) in eset:
                n_tri += 1
                per[x] += 1
                per[y] += 1
                per[z] += 1
    assert n_tri > 0  # the circulant guarantees triangles exist
    got = {r.doc_id: r.n_tri for r in triangles(docs).collect()}
    assert got == {v: c for v, c in per.items() if c > 0}


def test_bfs_levels_match_serial_bfs(spark):
    n = 53
    docs = spark.createDataFrame(
        [(i, "x", "en") for i in range(n)], "doc_id long, text string, lang string"
    )
    adj: dict[int, list[int]] = {}
    for s, d in _graph_edges(n):
        adj.setdefault(s, []).append(d)
    lvl = {0: 0}
    frontier = [0]
    depth = 0
    while frontier:
        depth += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in lvl:
                    lvl[v] = depth
                    nxt.append(v)
        frontier = nxt
    got = {r.doc_id: r.lvl for r in bfs_levels(docs).collect()}
    assert got == lvl
