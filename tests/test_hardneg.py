"""Hard-negative mining (operators/similarity.mine_hard_negatives):
the duplicate band is excluded, the below-band neighbors keep their order.
"""

from __future__ import annotations

from deepdoctection_spark.operators.similarity import mine_hard_negatives


def _embs(spark):
    # query 0; vec 1 is an exact-direction duplicate (cosine 1.0); vec 2/3
    # are informative near-misses; vec 4 is near-orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),
        (2, [0.9, 0.4, 0.0]),
        (3, [0.7, 0.7, 0.0]),
        (4, [0.0, 0.1, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_duplicate_band_is_excluded(spark):
    out = mine_hard_negatives(_embs(spark), n_queries=1, k=3).collect()
    got = [(r["vec_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(2, 1), (3, 2), (4, 3)]  # vec 1 (cosine 1.0) filtered


def test_without_threshold_duplicate_tops_the_list(spark):
    out = mine_hard_negatives(
        _embs(spark), n_queries=1, k=3, dup_cosine=1.01
    ).collect()
    top = min(out, key=lambda r: r["rank"])
    assert top["vec_id"] == 1 and top["cosine_sim"] == 1.0
