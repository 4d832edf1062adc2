"""ESRGAN GAN-step batch-saturation sweep (run on TPU, in isolation).

Round-5 re-sweep: the round-2 sweep (b64 389 > b32 381 crops/s)
predates the one-pass-BN and unrolled-K=2 step changes, so bench.py's
batch-32 default rests on stale data.  This drives bench.py's own
``bench_esrgan_gan`` (identical protocol: chained multi-step calls,
two measured phases keeping the second) at several batch sizes, with
a throwaway pass first and an order-swapped second sweep — the
first-measured variant in a process can read ~20% slow even after its
own warmup (docs/benchmarks.md methodology).

    python tools/sweep_esrgan_batch.py [--batches 32,48,64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,48,64")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import bench

    order = [batches[0]] + batches + list(reversed(batches))
    print(f"# sweep order (first is throwaway): {order}")
    for i, b in enumerate(order):
        bench.ESRGAN_BATCH = b
        tag = "throwaway" if i == 0 else f"pass{1 if i <= len(batches) else 2}"
        print(f"--- batch {b} ({tag}) ---")
        bench.bench_esrgan_gan()


if __name__ == "__main__":
    main()
