"""Hand-checked semantics for the query-time retrieval operators (the oracle
parity rows in test_entry_contract cover the corpus-scale plans; these pin
the fine-grained contracts — positions, conjunction, ranking ties — on a
fixture small enough to verify by eye)."""

from __future__ import annotations

import math

from deepdoctection_spark.operators import retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boolean_and_requires_every_term(spark):
    # df ranks with min_df=2: 'alpha' df=3, 'beta' df=3, 'gamma' df=2.
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha beta"),
            (3, "gamma beta alpha"),
            (4, "delta delta"),
        ],
    )
    out = {
        r["doc_id"]: r["total_tf"]
        for r in retrieval.boolean_and_search(docs, start_rank=1, n_terms=3).collect()
    }
    # docs 1 and 3 contain all of alpha/beta/gamma; doc 2 misses gamma.
    assert out == {1: 4, 3: 3}


def test_phrase_positions_and_counts(spark):
    # modal bigram is 'x y' (3 occurrences); 'y x' has 2 → loses.
    docs = _docs(
        spark,
        [
            (1, "x y x y"),       # 'x y' at pos 1 and 3
            (2, "a x y b"),       # 'x y' at pos 2
            (3, "q r s"),
        ],
    )
    rows = {r["doc_id"]: r for r in retrieval.phrase_search(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["phrase"] == "x y"
    assert (rows[1]["n_matches"], rows[1]["first_pos"]) == (2, 1)
    assert (rows[2]["n_matches"], rows[2]["first_pos"]) == (1, 2)


def test_phrase_tie_breaks_lexicographically(spark):
    docs = _docs(spark, [(1, "b c"), (2, "a b")])  # both bigrams count 1
    rows = retrieval.phrase_search(docs).collect()
    assert len(rows) == 1 and rows[0]["phrase"] == "a b"


def test_bm25_scores_match_serial_formula(spark):
    docs = _docs(
        spark,
        [
            (1, "t1 t1 t2 filler"),
            (2, "t1 t2 t2 t2"),
            (3, "t2 other words here"),
            (4, "t1 pad pad pad pad pad"),
        ],
    )
    # min_df=2 vocab: t1 df=3, t2 df=3, pad df=1(no)... pad occurs only doc4
    # → df ranks: t1=1, t2=2. Query = both terms.
    out = retrieval.bm25_query_search(docs, start_rank=1, n_terms=2, top_k=10)
    rows = {r["doc_id"]: r for r in out.collect()}

    tf = {1: {"t1": 2, "t2": 1}, 2: {"t1": 1, "t2": 3}, 3: {"t2": 1}, 4: {"t1": 1}}
    dl = {1: 4, 2: 4, 3: 4, 4: 6}
    n_docs, avgdl, df = 4, (4 + 4 + 4 + 6) / 4, {"t1": 3, "t2": 3}

    def serial_score(d):
        s6 = 0
        for t, f in tf[d].items():
            bidf6 = math.floor(
                math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)) * 1e6 + 0.5
            )
            sat = (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
            s6 += math.floor(bidf6 * sat + 0.5)
        return s6 / 1e6

    for d in tf:
        assert rows[d]["bm25"] == serial_score(d)
        assert rows[d]["n_terms_hit"] == len(tf[d])
    # ranking: scores desc, doc_id asc on ties
    ranked = sorted(rows.values(), key=lambda r: r["rank"])
    scores = [r["bm25"] for r in ranked]
    assert scores == sorted(scores, reverse=True)


def test_bm25_top_k_truncates(spark):
    docs = _docs(spark, [(i, "common word%d" % i) for i in range(1, 9)])
    out = retrieval.bm25_query_search(docs, start_rank=1, n_terms=1, top_k=3)
    assert out.count() == 3
