"""Sketches (HLL / Count-Min), NB classifier, and split-assign invariants.

The driver oracle already proves cross-engine value parity; these tests pin
the SEMANTIC guarantees: HLL error bounds on both estimator branches, the
CMS one-sided error, NB posterior sanity, and split determinism/proportions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deepdoctection_spark.operators.classify import nb_train_score
from deepdoctection_spark.operators.corpusprep import split_assign
from deepdoctection_spark.operators.sketches import (
    HLL_M,
    cms_heavy_hitters,
    hll_distinct,
)


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def test_hll_raw_branch_accuracy(spark, sf_parity):
    """sf0.01 has 3k-9k distinct shingles per lang → the raw-HLL branch.
    Standard error for m=256 is 1.04/sqrt(256) ≈ 6.5%; assert within 4σ."""
    rows = hll_distinct(_docs(spark, sf_parity)).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.exact_distinct > 2.5 * HLL_M  # raw branch exercised
        err = abs(r.hll_est - r.exact_distinct) / r.exact_distinct
        assert err < 0.26, (r.lang, r.exact_distinct, r.hll_est)


def test_hll_linear_counting_branch(spark):
    """A tiny group (distinct << m) must route through linear counting and
    land very close to exact (LC is near-exact when most registers are
    empty)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta", "xx") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    r = hll_distinct(docs).collect()[0]
    assert r.exact_distinct == 4  # 4 distinct 3-shingles of a 6-token text
    assert r.buckets_used <= 4
    assert abs(r.hll_est - r.exact_distinct) <= 1


def test_hll_merge_is_max_of_registers(spark, sf_parity):
    """Sketch of a union equals max-merge of per-part sketches: running HLL
    over all docs gives the same register state as over any partitioning —
    verified indirectly: estimate is independent of input partitioning."""
    docs = _docs(spark, sf_parity)
    a = {r.lang: r.hll_est for r in hll_distinct(docs.repartition(2)).collect()}
    b = {r.lang: r.hll_est for r in hll_distinct(docs.repartition(17)).collect()}
    assert a == b


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------


def test_cms_overestimate_guarantee(spark, sf_parity):
    rows = cms_heavy_hitters(_docs(spark, sf_parity)).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_est >= r.true_n, (r.token, r.true_n, r.cms_est)
    # with 31-token vocab vs 2048 cells, collisions are rare → most probes
    # should be exact
    exact = sum(1 for r in rows if r.cms_est == r.true_n)
    assert exact >= 15


# --------------------------------------------------------------------------
# Naive Bayes
# --------------------------------------------------------------------------


def test_nb_scores_and_coverage(spark, sf_parity):
    docs = _docs(spark, sf_parity)
    out = nb_train_score(docs)
    rows = out.collect()
    n_docs = docs.count()
    # held-out fold is md5 % 10 >= 8 → ~20%; every held-out doc with tokens
    # gets exactly one prediction
    assert 0.1 * n_docs < len(rows) < 0.35 * n_docs
    labels = {r.lang for r in rows}
    for r in rows:
        assert r.pred_label in labels
        assert r.score_micro < 0  # log-posterior of a multi-token doc
    assert len({r.doc_id for r in rows}) == len(rows)


def test_nb_beats_or_matches_uniform_guess(spark, sf_parity):
    """The synthetic corpus's per-lang distributions are nearly identical,
    so NB cannot be expected to separate them — but it must do at least as
    well as a uniform random guess (1/5) minus noise, and predictions must
    be deterministic across runs."""
    out1 = nb_train_score(_docs(spark, sf_parity)).collect()
    out2 = nb_train_score(_docs(spark, sf_parity)).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    acc = sum(1 for r in out1 if r.pred_label == r.lang) / len(out1)
    assert acc >= 0.05


def test_nb_separable_fixture(spark):
    """On a corpus whose classes have disjoint vocabulary NB must be
    near-perfect on held-out docs — pins that the math actually learns."""
    rows = []
    for i in range(60):
        lab = ["aa", "bb", "cc"][i % 3]
        words = {"aa": "apple apricot avocado", "bb": "banana berry bean",
                 "cc": "cherry citrus coconut"}[lab]
        rows.append((i, f"{words} {words} {words}", lab))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_train_score(docs).collect()
    assert out, "held-out fold must be non-empty"
    assert all(r.pred_label == r.lang for r in out)


# --------------------------------------------------------------------------
# split assignment
# --------------------------------------------------------------------------


def test_split_proportions_and_stability(spark, sf_parity):
    docs = _docs(spark, sf_parity)
    out = split_assign(docs)
    agg = {r.split: r.n for r in
           out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(agg.values())
    assert total == docs.count()
    assert 0.70 <= agg["train"] / total <= 0.90
    assert agg.get("val", 0) > 0 and agg.get("test", 0) > 0
    # stable across partitioning: same doc → same split
    a = dict(out.select("doc_id", "split").collect())
    b = dict(split_assign(docs.repartition(13)).select("doc_id", "split").collect())
    assert a == b


def test_hdr_quantile_bracket_guarantee(spark, sf_parity):
    """The sketch answer must bracket the true quantile: est_lb ≤ true
    disc-quantile value, and true value < next bucket boundary (exact below
    8, ≤25% relative width above)."""
    from deepdoctection_spark.operators.sketches import hdr_quantiles
    from deepdoctection_spark.operators.textstats import _tokens

    docs = spark.read.parquet(f"{sf_parity}/documents.parquet")
    vals = {}
    for r in docs.select("lang", F.size(_tokens()).alias("v")).collect():
        vals.setdefault(r.lang, []).append(r.v)
    got = hdr_quantiles(docs).collect()
    assert len(got) == 3 * len(vals)
    for row in got:
        vs = sorted(vals[row.lang])
        n = len(vs)
        true_q = vs[-(-row.q_pct * n // 100) - 1]  # ceil-rank disc quantile
        assert row.est_lb <= true_q
        upper = row.est_lb + 1 if row.est_lb < 8 else row.est_lb + (
            2 ** (row.bucket // 4 - 3)
        )
        assert true_q < upper


def test_hdr_quantiles_partitioning_invariant(spark, sf_parity):
    from deepdoctection_spark.operators.sketches import hdr_quantiles

    docs = spark.read.parquet(f"{sf_parity}/documents.parquet")
    a = {(r.lang, r.q_pct): r.est_lb for r in hdr_quantiles(docs.repartition(3)).collect()}
    b = {(r.lang, r.q_pct): r.est_lb for r in hdr_quantiles(docs.repartition(31)).collect()}
    assert a == b


# --------------------------------------------------------------------------
# KMV / theta set operations
# --------------------------------------------------------------------------


def _kmv_two_sets(spark, n_a=400, overlap=200, n_b_extra=150):
    rows = [("a", f"u{i}") for i in range(n_a)]
    rows += [("b", f"u{i}") for i in range(n_a - overlap, n_a)]
    rows += [("b", f"x{i}") for i in range(n_b_extra)]
    # duplicate mentions must not move any estimate (sketch of DISTINCT keys)
    rows += rows[:50]
    return spark.createDataFrame(rows, "s string, url string")


def test_kmv_setops_estimates_and_invariants(spark):
    from deepdoctection_spark.operators.sketches import KMV_K, kmv_setops

    out = {r.op: r for r in kmv_setops(_kmv_two_sets(spark)).collect()}
    assert set(out) == {"a", "b", "union", "intersect", "a_not_b"}
    for r in out.values():
        assert r.sk_n <= KMV_K
    assert out["a"].exact == 400
    assert out["b"].exact == 350
    assert out["union"].exact == 550
    assert out["intersect"].exact == 200
    assert out["a_not_b"].exact == 200
    # union-sketch membership partition: in_a rows split into both/only
    assert out["intersect"].sk_n + out["a_not_b"].sk_n <= KMV_K
    # k=64 → SE ≈ 1/sqrt(62) ≈ 12.7%; assert 4σ on the direct sketches
    for op in ("a", "b", "union"):
        r = out[op]
        assert abs(r.est - r.exact) / r.exact < 0.51, (op, r)
    # derived ops: absolute error bounded by the same sampling argument,
    # relative to the UNION size (their denominators), not their own
    for op in ("intersect", "a_not_b"):
        r = out[op]
        assert abs(r.est - r.exact) / out["union"].exact < 0.51, (op, r)


def test_kmv_small_sets_are_exact(spark):
    from deepdoctection_spark.operators.sketches import kmv_setops

    sets = spark.createDataFrame(
        [("a", f"u{i}") for i in range(20)]
        + [("b", f"u{i}") for i in range(10, 35)],
        "s string, url string",
    )
    out = {r.op: r for r in kmv_setops(sets).collect()}
    # every sketch holds the whole set → estimates ARE the exact counts
    for op, r in out.items():
        assert r.est == r.exact, (op, r)
    assert out["intersect"].exact == 10
    assert out["a_not_b"].exact == 10
    assert out["union"].exact == 35


def test_kmv_partitioning_invariance(spark):
    """The two-level bottom-k must yield the identical sketch regardless of
    input partitioning (the candidate superset always contains the true
    bottom-k)."""
    from deepdoctection_spark.operators.sketches import kmv_setops

    base = _kmv_two_sets(spark)
    one = {(r.op): (r.sk_n, r.kth, r.est)
           for r in kmv_setops(base.coalesce(1)).collect()}
    many = {(r.op): (r.sk_n, r.kth, r.est)
            for r in kmv_setops(base.repartition(13)).collect()}
    assert one == many
