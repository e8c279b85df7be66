"""Tight A/B timer for the HTML streaming extractor alone (no Spark).

Times extract_blocks_stream over the exact HTML third of the kernel-bench
payload mix, best-of-N, with the VM control probe polled before and after so
runs across edits are ratio-comparable. Usage:

    python scripts/lexer_ab.py [--repeat 7] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from deepdoctection_spark.kernels.html import extract_blocks_stream
from scripts.kernel_bench import build_payloads


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--repeat", type=int, default=7)
    args = ap.parse_args()

    payloads = [t for t, tool in build_payloads(args.sf) if tool == "browser"]
    c0 = bench.control_probe()
    # warmup + checksum (parity fingerprint across edits)
    import hashlib

    h = hashlib.md5()
    for t in payloads:
        for b in extract_blocks_stream(t):
            h.update(b.category.encode())
            h.update(b.text.encode())
            h.update(str(len(b.cells)).encode())
    walls = []
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        for t in payloads:
            extract_blocks_stream(t)
        walls.append(time.perf_counter() - t0)
    c1 = bench.control_probe()
    best = min(walls)
    print(
        json.dumps(
            {
                "docs": len(payloads),
                "docs_per_sec_best": round(len(payloads) / best, 1),
                "walls": [round(w, 4) for w in walls],
                "checksum": h.hexdigest(),
                "control_before": c0,
                "control_after": c1,
            }
        )
    )


if __name__ == "__main__":
    main()
