#!/usr/bin/env python
"""Benchmark regression gate: run bench.py, check every metric against
recorded floors (tools/bench_expectations.json).

Floors are set ~15% below measured steady state (re-based each round;
round-5 tightening so a reversion of the prior round's wins actually
trips the gate) — enough to absorb the tunnel's run-to-run variance
(docs/benchmarks.md methodology); a breach means a real regression,
not noise.  Run on TPU, in isolation:

    python tools/bench_regression.py          # run + check
    python tools/bench_regression.py --check bench_output.txt

Exit code 0 = all metrics at or above their floors.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def parse_metrics(text: str) -> dict:
    metrics = {}
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            metrics[rec["metric"]] = rec["value"]
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", type=str, default=None,
                    help="Parse a saved bench output instead of running.")
    args = ap.parse_args()

    with open(os.path.join(HERE, "bench_expectations.json")) as f:
        floors = json.load(f)

    if args.check:
        with open(args.check) as f:
            text = f.read()
    else:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, check=True,
        )
        text = proc.stdout

    metrics = parse_metrics(text)
    failed = False
    for name, spec in floors.items():
        got = metrics.get(name)
        if got is None:
            print(f"MISSING {name} (floor {spec['min']})")
            failed = True
        elif got < spec["min"]:
            print(f"REGRESSION {name}: {got} < floor {spec['min']} "
                  f"(steady state {spec['reference']})")
            failed = True
        else:
            print(f"ok {name}: {got} >= {spec['min']}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
