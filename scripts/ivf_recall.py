"""Recall@k of IVF ANN (seed vs trained quantizer) against exact brute-force.

Ground truth = knn_bruteforce top-k per query; recall@k = |ANN∩exact| / k
averaged over queries. Run at sf0.01 (500 × 64-dim vectors); results land in
BENCH.md's IVF section.

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
    ap.add_argument("--probes", type=int, default=2)
    args = ap.parse_args()

    from deepdoctection_spark import get_spark
    from deepdoctection_spark.operators import similarity

    spark = get_spark(app_name="ivf_recall")
    embs = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    nq, k = args.n_queries, args.k

    exact = topk_sets(
        similarity.knn_bruteforce(embs, n_queries=nq, k=k).collect()
    )
    seed = topk_sets(
        similarity.ivf_search(embs, n_queries=nq, k=k, probes=args.probes).collect()
    )
    stats: dict = {}
    cents = similarity.train_ivf_centroids(
        embs, rounds=None, max_rounds=25, stats=stats
    )
    trained = topk_sets(
        similarity.ivf_search(
            embs, n_queries=nq, k=k, probes=args.probes, centroids=cents
        ).collect()
    )
    print(
        f"queries={nq} k={k} probes={args.probes} clusters={similarity.IVF_K} | "
        f"lloyd rounds={stats['rounds']} converged={stats['converged']}"
    )
    print(f"recall@{k} seed-quantizer    = {recall(seed, exact, k):.3f}")
    print(f"recall@{k} trained-quantizer = {recall(trained, exact, k):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
