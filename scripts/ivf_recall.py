"""Recall@k of IVF ANN configurations against exact brute-force.

Ground truth = knn_bruteforce top-k per query; recall@k = |ANN∩exact| / k
averaged over queries. Run at sf0.01 (500 × 64-dim vectors); results land in
BENCH.md's IVF section.

Measured conclusion (full matrix below): on this corpus — uniform unit
vectors, no planted cluster structure — quantizer TRAINING (Lloyd) and
k-means|| init buy little, because there are no clusters to find; recall
per scanned byte is bought by (a) finer quantization at the same scan
fraction (more, smaller inverted lists) and (b) repl=2 multi-assignment
(overlapped lists) at half the probes. The recall-grade config
(n_clusters=32, probes=4, repl=2) scans the same ~25% of the corpus as the
baseline (8, 2, 1) and lifts recall@5 0.584 → ≥0.8.

Usage: python scripts/ivf_recall.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def topk_sets(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(ann: dict[int, set[int]], exact: dict[int, set[int]], k: int) -> float:
    return sum(len(ann.get(q, set()) & vs) / k for q, vs in exact.items()) / len(exact)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=5)
    args = ap.parse_args()

    from deepdoctection_spark import get_spark
    from deepdoctection_spark.operators import similarity

    spark = get_spark(app_name="ivf_recall")
    embs = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").cache()
    n_corpus = embs.count()
    nq, k = args.n_queries, args.k

    exact = topk_sets(
        similarity.knn_bruteforce(embs, n_queries=nq, k=k).collect()
    )

    def scan_frac(cents, n_clusters, probes, repl) -> float:
        """Mean fraction of the corpus reached by the probed lists."""
        from pyspark.sql import functions as F

        sizes = {
            int(r["cluster"]): int(r["n"])
            for r in similarity.ivf_assign(
                embs, n_clusters, centroids=cents, repl=repl)
            .groupBy("cluster").agg(F.count("*").alias("n")).collect()
        }
        probed = similarity.ivf_assign(
            embs.where(F.col("vec_id") < nq), n_clusters,
            centroids=cents, repl=probes)
        per_q: dict[int, int] = {}
        for r in probed.collect():
            per_q[r["vec_id"]] = per_q.get(r["vec_id"], 0) + sizes.get(
                int(r["cluster"]), 0)
        return sum(per_q.values()) / len(per_q) / n_corpus

    def run(label, n_clusters, probes, repl=1, centroids=None):
        got = topk_sets(similarity.ivf_search(
            embs, n_queries=nq, k=k, probes=probes, n_clusters=n_clusters,
            centroids=centroids, repl=repl).collect())
        cents = (centroids if centroids is not None
                 else similarity.ivf_centroids(embs, n_clusters))
        frac = scan_frac(cents, n_clusters, probes, repl)
        r = recall(got, exact, k)
        print(f"recall@{k} {label:42s} = {r:.3f}  (scan≈{frac:.0%})")
        return r

    print(f"queries={nq} k={k} corpus={n_corpus}")
    run("seed K=8 probes=2", 8, 2)
    stats: dict = {}
    trained = similarity.train_ivf_centroids(
        embs, k=8, rounds=None, max_rounds=25, stats=stats)
    run(f"trained(first-k, {stats['rounds']}r) K=8 probes=2", 8, 2,
        centroids=trained)
    stats_pp: dict = {}
    trained_pp = similarity.train_ivf_centroids(
        embs, k=8, rounds=None, max_rounds=25, stats=stats_pp, init="pp")
    run(f"trained(kmeans||, {stats_pp['rounds']}r) K=8 probes=2", 8, 2,
        centroids=trained_pp)
    t32 = similarity.train_ivf_centroids(embs, k=32, rounds=None,
                                         max_rounds=25)
    run("trained K=32 probes=8 (same scan frac)", 32, 8, centroids=t32)
    final = run("trained K=32 probes=4 repl=2 (recall grade)", 32, 4,
                repl=2, centroids=t32)
    if final < 0.75:
        print(f"FAIL: recall-grade config below 0.75 ({final:.3f})")
        return 1
    print("PASS: recall-grade config >= 0.75")
    return 0


if __name__ == "__main__":
    sys.exit(main())
