#!/usr/bin/env python
"""Compare the XLA vs Pallas fused pair-synthesis paths on real TPU.

Usage: python tools/bench_preprocess.py [--batch 64] [--crop 96]
Run in ISOLATION — concurrent TPU processes corrupt timings.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--crop", type=int, default=96)
    parser.add_argument("--steps", type=int, default=50)
    args = parser.parse_args()

    import jax
    import numpy as np

    from torchsr_tpu.data.preprocess import synthesize_pair
    from torchsr_tpu.ops.pallas.preprocess import synthesize_pair_pallas

    rng = np.random.default_rng(0)
    crops = jax.device_put(rng.integers(
        0, 256, (args.batch, args.crop, args.crop, 3), dtype=np.uint8
    ))
    flips = jax.device_put(rng.random((args.batch, 2)) < 0.5)

    for name, fn in (
        ("xla", synthesize_pair),
        ("pallas", synthesize_pair_pallas),
    ):
        lr, hr = fn(crops, flips)
        jax.block_until_ready((lr, hr))
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            lr, hr = fn(crops, flips)
            jax.block_until_ready((lr, hr))
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: median {np.median(times) * 1e6:.0f} us  "
            f"p90 {np.percentile(times, 90) * 1e6:.0f} us"
        )


if __name__ == "__main__":
    main()
