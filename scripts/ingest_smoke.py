#!/usr/bin/env python
"""Per-epoch cost profile of the streaming near-dup ingest (NearDupIngest).

Claim under test: per-batch compute scales with the BATCH (signatures are
computed for the increment only; the standing corpus contributes a band-key
index scan + a candidate-bounded text fetch) — NOT with the corpus. With
E equal-size epochs, an O(corpus)-per-epoch design would show epoch walls
growing ~linearly to E× the first; the expected profile is near-flat with a
mild tail from the growing index/corpus SCAN (I/O, not re-hashing; at real
scale the band_id-partitioned index plus Bloom/min-max file pruning on the
candidate doc_id fetch bounds that too).

    python scripts/ingest_smoke.py [--epochs 8] [--sf-dir /root/testdata/sf0.1]

Each epoch ingests the sf documents table re-keyed to fresh doc_ids, with a
deterministic 10% of rows kept as EXACT copies of epoch-0 text (dup-path
exercise: they must come back is_new=false from epoch 1 on). Prints one JSON
line with per-epoch walls, verdict counts, and corpus/index sizes.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from deepdoctection_spark import get_spark
    from deepdoctection_spark.streaming.ingest_neardup import NearDupIngest

    spark = get_spark(app_name="ingest_smoke")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="ingest_smoke_")
    ing = NearDupIngest(root, threshold=0.8)
    walls, news, dups = [], [], []
    try:
        for e in range(args.epochs):
            # fresh ids per epoch; 90% of texts made epoch-unique by a
            # deterministic character rotation (most shingles change, so
            # Jaccard vs every other epoch ~0 and the corpus really grows),
            # 10% kept verbatim (exact copies of every earlier epoch's same
            # rows → dups from e>=1)
            alpha = "etaoinshrd"
            rot = alpha[e % len(alpha):] + alpha[: e % len(alpha)]
            unique = F.translate(F.col("text"), alpha, rot)
            batch = docs.select(
                (F.col("doc_id") + F.lit(e * n_docs)).alias("doc_id"),
                F.when(F.col("doc_id") % 10 == 0, F.col("text"))
                .otherwise(unique)
                .alias("text"),
            )
            t0 = time.monotonic()
            ing.process_batch(batch, e)
            walls.append(round(time.monotonic() - t0, 2))
            v = (
                ing.verdicts.read(spark)
                .where(F.col("epoch") == e)
                .agg(
                    F.sum(F.col("is_new").cast("long")).alias("n_new"),
                    F.sum((~F.col("is_new")).cast("long")).alias("n_dup"),
                )
                .collect()[0]
            )
            news.append(int(v["n_new"]))
            dups.append(int(v["n_dup"]))
            print(
                f"epoch {e}: wall {walls[-1]}s new {news[-1]} dup {dups[-1]}",
                file=sys.stderr, flush=True,
            )
        corpus_rows = ing.corpus.read(spark).count()
        index_rows = ing.index.read(spark).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "ingest_epoch_walls_sec",
        "epochs": args.epochs,
        "batch_docs": n_docs,
        "walls": walls,
        "n_new": news,
        "n_dup": dups,
        "final_corpus_rows": corpus_rows,
        "final_index_rows": index_rows,
        "last_over_first": round(walls[-1] / walls[0], 2) if walls[0] else None,
    }))


if __name__ == "__main__":
    main()
