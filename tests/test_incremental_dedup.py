"""Incremental MinHash-LSH dedup: a new batch verified against a standing
corpus's band-key index (operators/dedup.py:incremental_minhash_dedup). The
end-to-end 80/20-split parity check is the dedup_incremental_lsh oracle row;
these tests pin the verdict semantics on hand-built inputs."""

from __future__ import annotations

from deepdoctection_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_lsh_pairs,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep dark forest to find some food for its hungry children"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_increment_doc_matches_best_corpus_dup(spark):
    corpus = _docs(
        spark,
        [
            (1, _BASE),
            (2, _BASE.replace("children", "offspring")),  # near-dup of 1
            (3, "completely different text about spark shuffles and joins "
                "partitioning skew salting broadcast hints and adaptive plans"),
        ],
    )
    inc = _docs(
        spark,
        [
            (10, _BASE + " tonight"),  # near-dup of corpus 1 and 2
            (11, "nothing in the corpus resembles this sentence at all "
                 "because it speaks of submarines and accordion festivals "
                 "under a violet sky full of paper lanterns and slow drums"),
        ],
    )
    rows = {r["doc_id"]: r for r in
            incremental_minhash_dedup(corpus, inc, threshold=0.5).collect()}
    assert set(rows) == {10, 11}
    # 10 matches both 1 and 2; best = highest jaccard (1, the closer text)
    assert rows[10]["dup_of"] == 1 and not rows[10]["is_new"]
    assert rows[10]["jaccard"] >= 0.5
    assert rows[11]["dup_of"] is None and rows[11]["is_new"]
    assert rows[11]["jaccard"] is None


def test_tie_breaks_to_smallest_corpus_doc_id(spark):
    corpus = _docs(spark, [(7, _BASE), (4, _BASE)])  # identical corpus twins
    inc = _docs(spark, [(20, _BASE)])
    (row,) = incremental_minhash_dedup(corpus, inc, threshold=0.9).collect()
    assert row["dup_of"] == 4 and row["jaccard"] == 1.0 and not row["is_new"]


def test_agrees_with_batch_lsh_on_cross_pairs(spark):
    """The incremental path must find exactly the corpus↔increment pairs the
    batch operator finds over the union (restricted to cross-split pairs and
    collapsed to best-match)."""
    rows = [
        (i, _BASE.replace("fox", w))
        for i, w in enumerate(["fox", "fox", "wolf", "cat qq zz", "fox"])
    ]
    rows += [(99, "unrelated words only here zebra xylophone quartz vortex "
                  "glyph jazz flummox quiver blitz sphinx judge my vow")]
    corpus = [r for r in rows if r[0] % 2 == 0]
    inc = [r for r in rows if r[0] % 2 == 1]
    both = _docs(spark, corpus + inc)
    batch_pairs = {
        tuple(sorted((r["doc_a"], r["doc_b"])))
        for r in minhash_lsh_pairs(both, threshold=0.8).collect()
    }
    corpus_ids = {r[0] for r in corpus}
    cross = {p for p in batch_pairs if (p[0] in corpus_ids) != (p[1] in corpus_ids)}
    got = incremental_minhash_dedup(
        _docs(spark, corpus), _docs(spark, inc), threshold=0.8
    ).collect()
    matched = {(r["doc_id"], r["dup_of"]) for r in got if not r["is_new"]}
    # every matched verdict corresponds to a batch cross pair
    for inc_id, dup_of in matched:
        assert tuple(sorted((inc_id, dup_of))) in cross
    # every increment doc with ≥1 batch cross pair got matched
    inc_with_cross = {p[0] if p[0] not in corpus_ids else p[1] for p in cross}
    assert inc_with_cross == {i for i, _ in matched}
