#!/usr/bin/env python
"""A/B benchmark: pixel-pair-packed Pallas conv vs the XLA conv lowering.

Protocol (CLAUDE.md Pallas rules): per-call dispatch through the tunnel
is ~4 ms, so each measurement jits ONE program containing a
``lax.fori_loop`` of chained convolutions and the cost per conv is the
SLOPE between two rep counts (dispatch and loop overheads cancel).
Every timed phase ends in a scalar readback; a throwaway measured phase
runs first in the process (the first timing loop reads 2-10x slow even
with warm compiles), and each path is then measured twice keeping the
second — the protocol is applied IDENTICALLY to both paths so neither
inherits the first-loop penalty (the round-2 bench_rdb.py flaw).

Usage: python tools/bench_pair_conv.py [--batch 128] [--h 24] [--w 24]
       [--dtype bf16|f32] [--mode fwd|fwdbwd|both]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPS_LO, REPS_HI = 8, 24


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--h", type=int, default=24)
    ap.add_argument("--w", type=int, default=24)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--mode", default="both",
                    choices=["fwd", "fwdbwd", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from torchsr_tpu.ops.pallas.pair_conv import (
        conv_reference,
        pair_conv,
    )

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    shape = (args.batch, args.h, args.w, 64)
    x0 = jnp.asarray(rng.normal(0, 0.5, shape), dt)
    k0 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 64)), jnp.float32)
    b0 = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)

    flops_per_conv = args.batch * args.h * args.w * 9 * 64 * 64 * 2

    def conv_of(fused):
        return pair_conv if fused else conv_reference

    @functools.partial(jax.jit, static_argnames=("fused", "reps"))
    def chain_fwd(x, k, b, *, fused, reps):
        f = conv_of(fused)

        def body(_, x):
            y = f(x, k, b)
            # keep magnitudes bounded so the chain can't overflow
            return (y * 0.1).astype(x.dtype)

        return jax.lax.fori_loop(0, reps, body, x)

    @functools.partial(jax.jit, static_argnames=("fused", "reps"))
    def chain_fwdbwd(x, k, b, *, fused, reps):
        f = conv_of(fused)

        def loss(x, k, b):
            return jnp.sum(f(x, k, b).astype(jnp.float32) ** 2)

        def body(_, carry):
            x, k, b = carry
            dx, dk, db = jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
            # chain through ALL gradients
            x = (x - 1e-6 * dx.astype(jnp.float32)).astype(x.dtype)
            k = k - 1e-9 * dk
            b = b - 1e-9 * db
            return x, k, b

        return jax.lax.fori_loop(0, reps, body, (x, k, b))

    def measure(chain, fused):
        # warm both rep counts (compile + upload), readback-terminated
        for reps in (REPS_LO, REPS_HI):
            out = chain(x0, k0, b0, fused=fused, reps=reps)
            float(jax.tree.leaves(out)[0].astype(jnp.float32).mean())
        times = {}
        for reps in (REPS_LO, REPS_HI):
            for _phase in range(2):
                t0 = time.perf_counter()
                out = chain(x0, k0, b0, fused=fused, reps=reps)
                float(jax.tree.leaves(out)[0].astype(jnp.float32).mean())
                times[reps] = time.perf_counter() - t0
        return (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)

    # throwaway measured phase: absorb the process's first-loop penalty
    measure(chain_fwd, fused=False)

    print(f"shape {shape} {args.dtype}; slope over reps "
          f"{REPS_LO}->{REPS_HI}, two phases each, keep the second")
    if args.mode in ("fwd", "both"):
        t_xla = measure(chain_fwd, fused=False)
        t_pair = measure(chain_fwd, fused=True)
        print(
            f"fwd:    XLA {t_xla * 1e6:8.1f} us/conv "
            f"({flops_per_conv / t_xla / 1e12:6.1f} TF/s)   "
            f"pair {t_pair * 1e6:8.1f} us/conv "
            f"({flops_per_conv / t_pair / 1e12:6.1f} TF/s)   "
            f"speedup {t_xla / t_pair:.2f}x"
        )
    if args.mode in ("fwdbwd", "both"):
        t_xla = measure(chain_fwdbwd, fused=False)
        t_pair = measure(chain_fwdbwd, fused=True)
        # fwd+bwd ~= 3 conv-equivalents of FLOPs
        print(
            f"fwdbwd: XLA {t_xla * 1e6:8.1f} us/conv "
            f"({3 * flops_per_conv / t_xla / 1e12:6.1f} TF/s)   "
            f"pair {t_pair * 1e6:8.1f} us/conv "
            f"({3 * flops_per_conv / t_pair / 1e12:6.1f} TF/s)   "
            f"speedup {t_xla / t_pair:.2f}x"
        )


if __name__ == "__main__":
    main()
