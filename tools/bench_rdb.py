"""A/B benchmark: fused Pallas RDB kernel vs the XLA conv lowering.

Run on real TPU, in isolation (CLAUDE.md timing rules):

    python tools/bench_rdb.py [--batch 16] [--hw 32] [--chain 30]

Chained-dependency timing with a terminal scalar readback (the repo's
standard honest-timing protocol); prints us/RDB and effective TFLOP/s
for both paths and the speedup.
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=32)
    ap.add_argument("--chain", type=int, default=30)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--bwd", action="store_true",
                    help="also A/B the fwd+bwd (custom-VJP) path")
    args = ap.parse_args()

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.models.esrgan import ResidualDenseBlock
    from torchsr_tpu.ops.pallas.rdb import fused_rdb

    dt = jnp.float32 if args.f32 else jnp.bfloat16
    b, h, w = args.batch, args.hw, args.hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (b, h, w, 64)), dt)
    # fused=False pins the true XLA-conv baseline (the module default
    # auto-selects the fused kernel on TPU, which would bench the
    # kernel against itself).
    rdb = ResidualDenseBlock(dtype=dt, fused=False)
    params = rdb.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 64), dt)
    )["params"]
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))

    n = args.chain

    @jax.jit
    def chain_xla(params, x):
        for _ in range(n):
            x = rdb.apply({"params": params}, x)
        return x

    @jax.jit
    def chain_pallas(ks, bs, x):
        for _ in range(n):
            x = fused_rdb(x, ks, bs)
        return x

    @jax.jit
    def chain_xla_bwd(params, x):
        def loss(params, x):
            for _ in range(n):
                x = rdb.apply({"params": params}, x)
            return jnp.sum(x.astype(jnp.float32) ** 2)

        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        return gx.astype(x.dtype)

    @jax.jit
    def chain_pallas_bwd(ks, bs, x):
        def loss(ks, bs, x):
            for _ in range(n):
                x = fused_rdb(x, ks, bs)
            return jnp.sum(x.astype(jnp.float32) ** 2)

        gk, gb, gx = jax.grad(loss, argnums=(0, 1, 2))(ks, bs, x)
        return gx.astype(x.dtype)

    def bench(fn, *fixed, x=x):
        y = fn(*fixed, x)
        float(jnp.mean(y.astype(jnp.float32)))  # warm + readback
        # Two measured phases per path, keep the second: the FIRST
        # timing loop in a process reads 2-10x slow even after a
        # readback-terminated warmup (CLAUDE.md Pallas rule 1) — and a
        # throwaway phase below ensures neither path inherits the
        # process-level first-loop penalty either.
        for _phase in range(2):
            t0 = time.perf_counter()
            y = x
            for _ in range(args.iters):
                y = fn(*fixed, y)
            float(jnp.mean(y.astype(jnp.float32)))  # completion proof
            elapsed = time.perf_counter() - t0
        return elapsed / (args.iters * n) * 1e6

    # correctness gate before timing
    ref = np.asarray(rdb.apply({"params": params}, x), np.float32)
    out = np.asarray(fused_rdb(x, ks, bs), np.float32)
    err = np.abs(out - ref).max()
    tol = 1e-4 if args.f32 else 3e-2
    assert err < tol, f"fused RDB mismatch: {err}"

    bench(chain_xla, params)  # throwaway: absorb first-loop penalty
    us_x = bench(chain_xla, params)
    us_p = bench(chain_pallas, ks, bs)
    flops = 2 * b * h * w * (4032 * 32 + 1728 * 64)
    print(f"shape ({b},{h},{w},64) {dt.__name__}, err={err:.2e}",
          file=sys.stderr)
    print(f"fwd:    XLA {us_x:8.1f} us/RDB ({flops / us_x / 1e6:6.1f} "
          f"TFLOP/s)  Pallas {us_p:8.1f} us/RDB "
          f"({flops / us_p / 1e6:6.1f} TFLOP/s)  "
          f"speedup {us_x / us_p:.2f}x")
    if args.bwd:
        us_xb = bench(chain_xla_bwd, params)
        us_pb = bench(chain_pallas_bwd, ks, bs)
        print(f"fwd+bwd: XLA {us_xb:7.1f} us/RDB "
              f"({3 * flops / us_xb / 1e6:6.1f} TFLOP/s)  "
              f"Pallas {us_pb:8.1f} us/RDB "
              f"({3 * flops / us_pb / 1e6:6.1f} TFLOP/s)  "
              f"speedup {us_xb / us_pb:.2f}x")


if __name__ == "__main__":
    main()
