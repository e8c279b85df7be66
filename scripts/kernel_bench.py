"""Single-core extraction-kernel micro-bench (no Spark).

Reproduces the exact per-row workload of the Arrow extraction stage
(operators/extraction.py) — extract_turn + finalize_turn over the same mixed
payload set bench.py feeds the full pipeline (sources/transcripts.py template
rendered over sf documents) — but single-threaded in one process, so the
number is per-core kernel rate with zero Spark/Arrow/JVM overhead.

This is the deterministic evidence harness for parser-hot-loop work
(VERDICT r3 next-round #5): the full-bench wall carries documented ±2×
hypervisor swings, while this isolate is stable to a few percent and directly
measures the thing being changed.

Usage:
    python scripts/kernel_bench.py [--sf /root/testdata/sf0.1] [--repeat 5]
    python scripts/kernel_bench.py --profile   # cProfile top functions

Reference analogue: TestDataSpeed's warmup + wall discipline
(/root/reference/deepdoctection/dataflow/common.py:23-61).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepdoctection_spark.kernels.extract import extract_turn, finalize_turn
from deepdoctection_spark.sources.transcripts import HTML_PAYLOAD, PDFISH_PAYLOAD


def render(pieces, row) -> str:
    vals = {"d": str(row["doc_id"]), "t": row["text"], "l": row["lang"], "s": row["source"]}
    return "".join(v if kind == "lit" else vals[v] for kind, v in pieces)


def build_payloads(sf_dir: str) -> list[tuple[str, str]]:
    """(text, tool) rows — the exact mix build_transcripts synthesizes."""
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    out: list[tuple[str, str]] = []
    for row in tbl.to_pylist():
        mod = row["doc_id"] % 3
        if mod == 1:
            out.append((render(HTML_PAYLOAD, row), "browser"))
        elif mod == 2:
            out.append((render(PDFISH_PAYLOAD, row), "pdf_reader"))
        else:
            out.append((row["text"], ""))
    return out


def run_once(payloads: list[tuple[str, str]]) -> float:
    t0 = time.perf_counter()
    for i, (text, tool) in enumerate(payloads):
        blocks = extract_turn(text, tool)
        finalize_turn("conv-%05d" % (i // 8), i % 8, blocks, with_words=False)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()

    payloads = build_payloads(args.sf)
    n = len(payloads)
    run_once(payloads[: n // 10])  # warmup

    if args.profile:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        run_once(payloads)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
        return

    walls = [run_once(payloads) for _ in range(args.repeat)]
    best = min(walls)
    print(
        json.dumps(
            {
                "metric": "single_core_kernel_turns_per_sec",
                "value": round(n / best, 1),
                "unit": "turns/sec",
                "turns": n,
                "trials": [round(w, 4) for w in walls],
                "best_wall_s": round(best, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
