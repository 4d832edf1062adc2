#!/usr/bin/env python
"""Secondary benchmark: tiled 4x upscale throughput (1080p -> 4K).

BASELINE.md config 5: batched tiled inference with overlap-blend halo
tiles.  Reports megapixels/sec of *input* processed (1080p frame = 2.07
MP -> 4K output).

Usage: python tools/bench_inference.py [--model srgan|esrgan]
       [--tile 128] [--overlap 16] [--tile-batch 8] [--blocks N]
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
    parser.add_argument("--model", default="esrgan",
                        choices=["srgan", "esrgan"])
    parser.add_argument("--tile", type=int, default=0,
                        help="0 = model default: 64 for ESRGAN (keeps "
                             "the fused Pallas RDB kernel active), 128 "
                             "for SRGAN.")
    parser.add_argument("--overlap", type=int, default=16)
    parser.add_argument("--tile-batch", type=int, default=8)
    parser.add_argument("--blocks", type=int, default=0,
                        help="generator blocks (0 = full size)")
    parser.add_argument("--frames", type=int, default=3)
    args = parser.parse_args()
    if not args.tile:
        args.tile = 64 if args.model == "esrgan" else 128

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from torchsr_tpu.infer.tiled import tiled_upscale
    from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator

    if args.model == "esrgan":
        gen = ESRGANGenerator(
            num_rrdb_blocks=args.blocks or 23, dtype=jnp.bfloat16
        )
    else:
        gen = SRGANGenerator(
            num_residual=args.blocks or 16, dtype=jnp.bfloat16
        )
    x0 = jnp.zeros((1, args.tile, args.tile, 3))
    variables = jax.device_put(
        gen.init(jax.random.PRNGKey(0), x0, train=False)
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(
        rng.random((1080, 1920, 3)).astype(np.float32)
    )

    def run():
        return tiled_upscale(
            infer_fn, frame, scale=4, tile=args.tile,
            overlap=args.overlap, tile_batch=args.tile_batch,
            params=variables,
        )

    t0 = time.perf_counter()
    out = run()
    # a scalar readback is the only trustworthy completion barrier on
    # tunneled runtimes (block_until_ready can return early)
    float(out.mean())
    compile_time = time.perf_counter() - t0
    assert out.shape == (4320, 7680, 3)

    t0 = time.perf_counter()
    for _ in range(args.frames):
        out = run()
    float(out.mean())
    per_frame = (time.perf_counter() - t0) / args.frames

    mp_in = 1920 * 1080 / 1e6
    print(
        f"{args.model} tiled 1080p->4K: {per_frame*1000:.0f} ms/frame "
        f"({mp_in/per_frame:.2f} MP/s in, {mp_in*16/per_frame:.1f} MP/s "
        f"out, {1/per_frame:.2f} fps; tile={args.tile} "
        f"overlap={args.overlap} batch={args.tile_batch}; "
        f"compile {compile_time:.0f}s)"
    )


if __name__ == "__main__":
    main()
