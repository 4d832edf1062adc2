"""Probe: does the v5e MXU run int8 GEMMs faster than bf16 here?

Motivation: the ESRGAN serving path is RDB-kernel-bound (~17.7 MP/s
device-side, docs/benchmarks.md), and the fused RDB kernel's GEMM
passes are the cost.  v5e datasheets quote int8 at 2x the bf16 MACs;
if that materializes through this XLA/Mosaic toolchain at RDB-like
shapes, an int8 inference mode is the next real serving win.  If the
MXU pass model (time ~ ceil(K/128)*ceil(N/128) stationary tiles *
M/8 cycles, dtype-independent) governs instead, int8 buys nothing at
pass-bound shapes and the idea dies here.

Protocol (CLAUDE.md Pallas rule 1): dependency-chained fori_loop
INSIDE one jit call, slope = (t(R2) - t(R1)) / (R2 - R1), scalar
readback, a throwaway measured phase first, both variants timed with
identical discipline, order swapped across phases.

Run ALONE on the real TPU:  python tools/probe_int8_mxu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax


def _chain(dtype, acc_dtype, m, k, n):
    """Build f(x, w1, w2, reps): reps iterations of two chained GEMMs.

    x:(m,k) @ w1:(k,n) -> (m,n); @ w2:(n,k) -> (m,k), cast back to
    `dtype` so the loop carries a fixed-shape dependency.  Each
    iteration = 2*m*k*n*2 FLOPs (counting both GEMMs).
    """

    def run(x, w1, w2, reps):
        def body(_, x):
            y = lax.dot_general(
                x, w1, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            if dtype == jnp.int8:
                y = (y >> 7).astype(jnp.int8)
            else:
                # abs blocks any algebraic folding of the linear chain
                y = (jnp.abs(y) * 0.125).astype(dtype)
            z = lax.dot_general(
                y, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            if dtype == jnp.int8:
                return (z >> 7).astype(jnp.int8)
            return (jnp.abs(z) * 0.125).astype(dtype)

        return lax.fori_loop(0, reps, body, x)

    return run


def _make(dtype, m, k, n, key):
    kx, k1, k2 = jax.random.split(key, 3)
    if dtype == jnp.int8:
        x = jax.random.randint(kx, (m, k), -16, 16, jnp.int32).astype(jnp.int8)
        w1 = jax.random.randint(k1, (k, n), -16, 16, jnp.int32).astype(jnp.int8)
        w2 = jax.random.randint(k2, (n, k), -16, 16, jnp.int32).astype(jnp.int8)
    elif dtype == jnp.float8_e4m3fn:
        x = jax.random.normal(kx, (m, k), jnp.float32).astype(dtype)
        w1 = (jax.random.normal(k1, (k, n), jnp.float32) * 0.1).astype(dtype)
        w2 = (jax.random.normal(k2, (n, k), jnp.float32) * 0.1).astype(dtype)
    else:
        x = jax.random.normal(kx, (m, k), jnp.float32).astype(dtype)
        w1 = jax.random.normal(k1, (k, n), jnp.float32).astype(dtype) * 0.1
        w2 = jax.random.normal(k2, (n, k), jnp.float32).astype(dtype) * 0.1
    return x, w1, w2


def probe(dtype_name, m, k, n, r1=10_000, r2=60_000):
    """r1/r2 must be large enough that (r2-r1)*iter_time >> the ~ms
    tunnel/dispatch jitter — the first probe draft used 64/256 and read
    negative slopes and above-peak TFLOP/s (pure noise)."""
    dtype = {
        "bf16": jnp.bfloat16,
        "int8": jnp.int8,
        "f32": jnp.float32,
        "fp8": jnp.float8_e4m3fn,
    }[dtype_name]
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    run = _chain(dtype, acc, m, k, n)
    fn = jax.jit(run, static_argnums=(3,))
    x, w1, w2 = _make(dtype, m, k, n, jax.random.PRNGKey(0))

    def timed(reps):
        out = fn(x, w1, w2, reps)
        # Scalar readback terminates the chain (rule: block_until_ready
        # is not trustworthy here).
        return float(jnp.abs(out.astype(jnp.float32)).mean())

    # Warm both rep counts (compile) with readback.
    timed(r1), timed(r2)
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter(); timed(r1); t1 = time.perf_counter()
        timed(r2); t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (r2 - r1))
    flops_per_iter = 2 * 2 * m * k * n
    best = min(slopes[1:])  # drop the first measured phase
    return best, flops_per_iter / best / 1e12, slopes


def probe_conv(dtype_name, b=8, h=64, w=64, c=64, r1=2_000, r2=12_000):
    """Chained 3x3 same-conv, SRGAN-tower shape: does XLA lower int8
    convs to the MXU at the int8 rate?  Each iteration re-quantizes the
    activation (the realistic serving cost)."""
    dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[dtype_name]
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    dn = lax.conv_dimension_numbers((b, h, w, c), (3, 3, c, c),
                                    ("NHWC", "HWIO", "NHWC"))

    def run(x, k, reps):
        def body(_, x):
            y = lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc,
            )
            if dtype == jnp.int8:
                return (y >> 7).astype(jnp.int8)
            return (jnp.abs(y) * 0.125).astype(dtype)

        return lax.fori_loop(0, reps, body, x)

    fn = jax.jit(run, static_argnums=(2,))
    key = jax.random.PRNGKey(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (b, h, w, c), -16, 16, jnp.int32).astype(jnp.int8)
        k = jax.random.randint(key, (3, 3, c, c), -16, 16, jnp.int32).astype(jnp.int8)
    else:
        x = jax.random.normal(key, (b, h, w, c), jnp.float32).astype(dtype)
        k = (jax.random.normal(key, (3, 3, c, c), jnp.float32) * 0.05).astype(dtype)

    def timed(reps):
        out = fn(x, k, reps)
        return float(jnp.abs(out.astype(jnp.float32)).mean())

    timed(r1), timed(r2)
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter(); timed(r1); t1 = time.perf_counter()
        timed(r2); t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (r2 - r1))
    flops_per_iter = 2 * b * h * w * 9 * c * c
    best = min(slopes[1:])
    return best, flops_per_iter / best / 1e12, slopes


def main():
    print("devices:", jax.devices())
    # (name, m, k, n, r1, r2) — reps sized so the timed difference is
    # ~0.5-1 s of device work per call.
    shapes = [
        ("mxu-saturating", 2048, 512, 512, 5_000, 30_000),
        ("rdb-like", 2048, 192, 128, 20_000, 160_000),
        ("rdb-small-n", 2048, 192, 96, 20_000, 160_000),
    ]
    # Throwaway measured phase for the whole process (first timing loop
    # in a process reads 2-10x slow even warmed).
    probe("bf16", 512, 512, 512, 2_000, 10_000)

    for order in (("bf16", "int8"), ("int8", "bf16")):
        print(f"--- order {order} ---")
        for name, m, k, n, r1, r2 in shapes:
            for d in order:
                s, tf, slopes = probe(d, m, k, n, r1, r2)
                unit = "TOP/s" if d == "int8" else "TFLOP/s"
                print(f"{name:16s} {d:5s} ({m}x{k}x{n}) "
                      f"{s*1e6:9.2f} us/iter  {tf:6.1f} {unit}  "
                      f"slopes={['%.2f' % (x*1e6) for x in slopes]}",
                      flush=True)

    for d in ("bf16", "int8", "bf16", "int8"):
        s, tf, slopes = probe_conv(d)
        unit = "TOP/s" if d == "int8" else "TFLOP/s"
        print(f"{'conv3x3-64ch':16s} {d:5s} (8x64x64x64)  "
              f"{s*1e6:9.2f} us/iter  {tf:6.1f} {unit}  "
              f"slopes={['%.2f' % (x*1e6) for x in slopes]}", flush=True)

    try:
        s, tf, slopes = probe("fp8", 2048, 512, 512, 5_000, 30_000)
        print(f"{'mxu-saturating':16s} fp8   (2048x512x512) "
              f"{s*1e6:9.2f} us/iter  {tf:6.1f} TFLOP/s  "
              f"slopes={['%.2f' % (x*1e6) for x in slopes]}")
    except Exception as e:  # v5e may not support fp8 at all
        print(f"fp8 probe failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
