"""Run every bench.py metric in sequence and aggregate one JSON report.

Usage: python tools/bench_all.py [--out BENCH_ALL.json] [--skip sift_e2e ...]

Each metric runs in a FRESH subprocess (one TPU process at a time, no
cross-metric compile-cache effects) with generous timeouts; failures are
recorded, not fatal. Intended for round-over-round regression tracking —
compare against the bands in docs/PERF.md (relay run-to-run variance is
±20-30%, so only same-session comparisons are meaningful; run this twice
if a number looks off).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

METRICS = ("throughput", "sift", "sift_e2e", "encode_map", "deep_e2e",
           "latency", "serving_qps")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_metric(metric: str, timeout: int = 1800) -> dict:
    env = dict(os.environ, PYVISIM_BENCH_METRIC=metric)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        rec = json.loads(line)
        rec["wall_s"] = round(time.time() - t0, 1)
        return rec
    except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
        return {
            "metric": metric,
            "error": f"{type(e).__name__}: {e}",
            "wall_s": round(time.time() - t0, 1),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the report here too")
    ap.add_argument("--skip", nargs="*", default=[], choices=METRICS)
    args = ap.parse_args()

    report = {}
    for metric in METRICS:
        if metric in args.skip:
            continue
        rec = run_metric(metric)
        report[metric] = rec
        print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
