"""Large-input smoke: full extraction + reassembly + one dedup pass at 10M
turns (one decade over the 1M round-2 smoke), with the executor-JVM RSS
trajectory sampled throughout — proves the narrow-stage memory footprint
stays flat when the input far exceeds page-cache comfort.

Run under spark-submit (the JVM is this script's parent process, so RSS is
read from /proc/<ppid>/status):

    spark-submit --master local[32] --driver-memory 16g \\
        --py-files dist/deepdoctection_spark.zip scripts/big_smoke.py \\
        --repl 2000 --out /tmp/big_smoke.json

Writes the metrics JSON incrementally after each phase.
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import time


def _jvm_rss_mb() -> float:
    """RSS of the parent JVM (spark-submit launches python as its child)."""
    try:
        with open(f"/proc/{os.getppid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        pass
    return -1.0


class RssSampler:
    def __init__(self, interval: float = 2.0):
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval,), daemon=True)

    def _run(self, interval: float) -> None:
        while not self._stop.is_set():
            self.samples.append(_jvm_rss_mb())
            self._stop.wait(interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()

    def summary(self) -> dict:
        s = [x for x in self.samples if x > 0]
        if not s:
            return {}
        return {
            "rss_mb_start": s[0],
            "rss_mb_peak": max(s),
            "rss_mb_end": s[-1],
            "rss_samples": len(s),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repl", type=int, default=2000)  # 2000 × 5k = 10M turns
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default="/tmp/big_smoke.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from deepdoctection_spark.config import get_spark
    from deepdoctection_spark.operators.extraction import extract_transcripts
    from deepdoctection_spark.operators.reassembly import reassemble_conversations
    from deepdoctection_spark.sources.transcripts import (
        build_transcripts,
        replicated_transcripts,
    )

    spark = get_spark(
        app_name="big_smoke", master=None, shuffle_partitions=max(8, args.cores)
    )
    t = replicated_transcripts(
        spark, args.sf_dir, args.repl, partitions=args.cores * 4
    )
    # warm-up excluded from measurement
    extract_transcripts(
        build_transcripts(spark, args.sf_dir).limit(256)
    ).write.format("noop").mode("overwrite").save()
    n_turns = t.count()
    metrics: dict = {"turns": n_turns, "cores": args.cores, "repl": args.repl}

    def phase(name: str, df_builder) -> None:
        with RssSampler() as rss:
            t0 = time.monotonic()
            df_builder().write.format("noop").mode("overwrite").save()
            wall = round(time.monotonic() - t0, 1)
        metrics[name] = {
            "wall_sec": wall,
            "turns_per_sec": round(n_turns / wall, 1),
            **rss.summary(),
        }
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=1)
        print(name, json.dumps(metrics[name]), flush=True)

    phase("extract", lambda: extract_transcripts(t, with_words=True))
    phase(
        "extract_reassemble",
        lambda: reassemble_conversations(extract_transcripts(t, with_words=False)),
    )
    # one dedup pass over the extracted corpus: md5 fingerprint + groupBy
    # (the exact-dedup shape — one hash shuffle with map-side combine)
    phase(
        "extract_dedup_exact",
        lambda: extract_transcripts(t, with_words=False)
        .select(F.md5("extracted_text").alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 0),
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
