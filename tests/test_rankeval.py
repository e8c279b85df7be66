"""Ranking metrics (operators/rankeval.py): integer micro-unit recall/MRR/
nDCG. End-to-end parity is the eval_rank_metrics oracle row; these pin the
metric arithmetic on hand-built rankings."""

from __future__ import annotations

from deepdoctection_spark.operators.rankeval import dcg_weights, rank_metrics


def _rel(spark, rows):
    return spark.createDataFrame(rows, "query_id long, vec_id long, rank int")


def test_perfect_and_empty_and_partial(spark):
    truth = _rel(spark, [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2),
                         (3, 30, 1), (3, 31, 2)])
    system = _rel(spark, [
        (1, 10, 1), (1, 11, 2),      # perfect
        (2, 99, 1), (2, 98, 2),      # zero hits
        (3, 77, 1), (3, 30, 2),      # one hit at rank 2
    ])
    got = {r["query_id"]: r for r in rank_metrics(system, truth, k=2).collect()}
    w = dcg_weights(2)
    assert got[1]["n_hits"] == 2 and got[1]["recall_micro"] == 1_000_000
    assert got[1]["mrr_micro"] == 1_000_000
    assert got[1]["ndcg_micro"] == 1_000_000  # sum(w)/sum(w)
    assert got[2]["n_hits"] == 0 and got[2]["recall_micro"] == 0
    assert got[2]["mrr_micro"] == 0 and got[2]["ndcg_micro"] == 0
    assert got[3]["n_hits"] == 1 and got[3]["recall_micro"] == 500_000
    assert got[3]["mrr_micro"] == 500_000  # first relevant at rank 2
    assert got[3]["ndcg_micro"] == w[1] * 1_000_000 // sum(w)


def test_weights_are_monotone_integers(spark):
    w = dcg_weights(10)
    assert w[0] == 1_000_000 and all(a > b for a, b in zip(w, w[1:]))
    assert all(isinstance(x, int) for x in w)


def test_system_rank_order_matters_not_truth_rank(spark):
    # same membership, different system order → same recall, different MRR/nDCG
    truth = _rel(spark, [(1, 10, 1), (1, 11, 2)])
    sys_a = _rel(spark, [(1, 10, 1), (1, 99, 2)])
    sys_b = _rel(spark, [(1, 99, 1), (1, 10, 2)])
    (ra,) = rank_metrics(sys_a, truth, k=2).collect()
    (rb,) = rank_metrics(sys_b, truth, k=2).collect()
    assert ra["recall_micro"] == rb["recall_micro"] == 500_000
    assert ra["mrr_micro"] == 1_000_000 and rb["mrr_micro"] == 500_000
    assert ra["ndcg_micro"] > rb["ndcg_micro"]
