"""Connected-components cluster formation over dup pairs (end-to-end is the
dedup_clusters row of the parity gate)."""

from __future__ import annotations

from deepdoctection_spark.operators.dedupclusters import (
    connected_components,
    dup_clusters,
)


def test_multi_hop_chain_converges(spark):
    # path graph 1-2-3-4-5 plus an isolated edge 10-11: min-label needs
    # several propagation rounds to reach the chain's far end
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (10, 11)], "doc_a long, doc_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dup_clusters_keep_flags_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in dup_clusters(docs, pairs).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[3]["cluster_id"] == 1
    assert rows[1]["cluster_size"] == 3
    assert rows[1]["is_kept"] and not rows[2]["is_kept"]
    # singletons are their own kept cluster
    assert rows[4]["cluster_id"] == 4 and rows[4]["cluster_size"] == 1 and rows[4]["is_kept"]
    assert rows[5]["cluster_size"] == 2 and rows[6]["cluster_id"] == 5


def test_nonconvergence_raises(spark):
    # long path graph with max_iter too small: unconverged labels are wrong
    # (split clusters → wrong keep/drop), so the operator must fail loudly
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2).collect()


def test_cluster_select_longest_policy(spark):
    from deepdoctection_spark.operators.dedupclusters import (
        cluster_select_longest,
        dup_clusters,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # cluster {1,2,3}: 3 is longest
            (2, "a b c"),
            (3, "a b c d e f g h i"),
            (9, "loner text"),          # singleton keeps itself
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    out = {r.doc_id: r for r in
           cluster_select_longest(docs, dup_clusters(docs, pairs)).collect()}
    assert out[3].keep_longest == 1
    assert out[1].keep_longest == 0 and out[2].keep_longest == 0
    assert out[9].keep_longest == 1
    # exactly one keeper per cluster
    from collections import Counter

    keeps = Counter(r.cluster_id for r in out.values() if r.keep_longest)
    sizes = Counter(r.cluster_id for r in out.values())
    assert keeps == Counter(dict.fromkeys(sizes, 1))
    # tie on length -> lower doc_id wins
    docs2 = spark.createDataFrame(
        [(5, "x y"), (6, "p q")], "doc_id long, text string")
    pairs2 = spark.createDataFrame([(5, 6)], "doc_a long, doc_b long")
    out2 = {r.doc_id: r.keep_longest for r in
            cluster_select_longest(docs2, dup_clusters(docs2, pairs2)).collect()}
    assert out2 == {5: 1, 6: 0}
