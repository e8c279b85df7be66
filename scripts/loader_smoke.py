"""Loader-prep scale smoke: the Feistel epoch shuffle and the stride mixture
interleave at 100M rows — the two round-5 loader primitives whose 10^12
story is "narrow map + bounded window, never a global sort". This run pins
the claimed shape at 4 decades above the oracle scale: wall-clock rate for
(a) one full epoch permutation + shard-local ranking over 100M synthetic
ids and (b) the stride schedule over the same rows split across 8 sources.

    python scripts/loader_smoke.py [--rows 100000000] [--out /tmp/loader_smoke.json]

Uses a noop sink (distributed materialization, nothing collected).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--out", default="/tmp/loader_smoke.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from deepdoctection_spark import get_spark
    from deepdoctection_spark.operators.convprep import epoch_shuffle
    from deepdoctection_spark.operators.corpusprep import stride_schedule

    spark = get_spark(app_name="loader_smoke")
    out: dict = {"rows": args.rows}

    ids = spark.range(args.rows).select(F.col("id").alias("doc_id"))

    t0 = time.time()
    epoch_shuffle(ids, epochs=1, n_shards=32).write.format("noop").mode(
        "overwrite").save()
    w = time.time() - t0
    out["epoch_shuffle"] = {"wall_s": round(w, 1),
                            "rows_per_sec": round(args.rows / w)}

    srcs = ids.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string")))
    wts = spark.createDataFrame(
        [(f"s{i}", [300000, 200000, 150000, 100000, 90000, 70000, 50000,
                    40000][i]) for i in range(8)],
        "source string, weight_q6 long")
    t0 = time.time()
    stride_schedule(srcs, wts).write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    out["stride_schedule"] = {"wall_s": round(w, 1),
                              "rows_per_sec": round(args.rows / w)}

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
