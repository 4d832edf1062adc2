#!/usr/bin/env python
"""A/B probe: BatchNorm statistics passes in the SRGAN tower (real TPU).

The round-3 finding: BN costs 22% of tower fwd+bwd (tower 100 TF/s with
BN, 128 without; docs/benchmarks.md).  The two-pass variance
(``mean((x - mean)^2)``, layers.py _TorchBN) makes the stats a
data-dependent SECOND sweep over the activation that XLA cannot fuse
with the first.  Candidate: **running-mean-shifted one-pass moments** —

    d   = x - stop_grad(running_mean)      # shift constant wrt x
    s1  = mean(d); s2 = mean(d*d)          # ONE sweep, sibling-fused
    mean = shift + s1
    var  = s2 - s1^2                       # exact; safe: s1 ~ 0

identical math in exact arithmetic, and numerically safe because the
shift tracks the batch mean (the catastrophic form is E[x^2] - E[x]^2
with E[x] >> std; here s1 is the drift since the last momentum update).

Timing protocol (CLAUDE.md): reps chained in one jit via scalar
coupling, slope across two chain lengths, process throwaway phase, two
measured phases keeping the second, full-gradient-tree consumption, and
an order-swapped confirmation run (--order swapped).

    python tools/probe_bn_stats.py [--batch 128] [--hw 24] [--order normal]

Components:
  bn2pass / bn1pass       one train-mode BN fwd+bwd at tower shape
  tower2 / tower1         16-block tower fwd+bwd, two-pass vs one-pass BN
  tower_nobn              the no-BN ceiling
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=24)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=3)
    ap.add_argument("--components", default="")
    ap.add_argument("--order", default="normal",
                    choices=["normal", "swapped"])
    args = ap.parse_args()
    only = set(filter(None, args.components.split(",")))

    def want(name):
        return not only or name in only

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.models.layers import BatchNorm, Conv, PReLU

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    b, hw = args.batch, args.hw
    x64 = jax.random.normal(key, (b, hw, hw, 64), dt)

    class OnePassBN(nn.Module):
        """Running-mean-shifted one-pass BN (candidate), torch-exact
        running-average semantics like layers._TorchBN."""

        use_running_average: bool = False
        momentum: float = 0.1
        epsilon: float = 1e-5
        dtype = None

        @nn.compact
        def __call__(self, x, train=True):
            xf = x.astype(jnp.float32)
            c = xf.shape[-1]
            scale = self.param(
                "scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param(
                "bias", nn.initializers.zeros, (c,), jnp.float32)
            ra_mean = self.variable(
                "batch_stats", "mean",
                lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable(
                "batch_stats", "var",
                lambda: jnp.ones((c,), jnp.float32))
            if not train:
                mean, var = ra_mean.value, ra_var.value
            else:
                axes = tuple(range(xf.ndim - 1))
                shift = jax.lax.stop_gradient(ra_mean.value)
                d = xf - shift
                s1 = jnp.mean(d, axes)
                s2 = jnp.mean(d * d, axes)
                mean = shift + s1
                var = jnp.maximum(s2 - s1 * s1, 0.0)
                if not self.is_initializing():
                    n = xf.size // c
                    bessel = n / max(n - 1, 1)
                    m = self.momentum
                    ra_mean.value = (
                        (1.0 - m) * ra_mean.value + m * mean)
                    ra_var.value = (
                        (1.0 - m) * ra_var.value + m * var * bessel)
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            out = (xf - mean) * inv + bias
            return out.astype(x.dtype)

    class Block2(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            out = Conv(64, (3, 3), use_bias=False, dtype=dt,
                       name="conv1")(x)
            out = BatchNorm(use_running_average=not train, dtype=dt,
                            name="bn1")(out)
            out = PReLU(name="prelu")(out)
            out = Conv(64, (3, 3), use_bias=False, dtype=dt,
                       name="conv2")(out)
            out = BatchNorm(use_running_average=not train, dtype=dt,
                            name="bn2")(out)
            return out + x

    class Block1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            out = Conv(64, (3, 3), use_bias=False, dtype=dt,
                       name="conv1")(x)
            out = OnePassBN(name="bn1")(out, train=train)
            out = PReLU(name="prelu")(out)
            out = Conv(64, (3, 3), use_bias=False, dtype=dt,
                       name="conv2")(out)
            out = OnePassBN(name="bn2")(out, train=train)
            return out + x

    class Block0(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            out = Conv(64, (3, 3), use_bias=False, dtype=dt,
                       name="conv1")(x)
            out = PReLU(name="prelu")(out)
            out = Conv(64, (3, 3), use_bias=False, dtype=dt,
                       name="conv2")(out)
            return out + x

    def tower(block_cls):
        class Tower(nn.Module):
            @nn.compact
            def __call__(self, x, train=True):
                for i in range(16):
                    x = block_cls(name=f"block{i}")(x, train=train)
                return x

        return Tower()

    class JustBN2(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return BatchNorm(use_running_average=not train, dtype=dt,
                             name="bn")(x)

    class JustBN1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return OnePassBN(name="bn")(x, train=train)

    def consume(tree):
        acc = jnp.float32(0.0)
        for leaf in jax.tree.leaves(tree):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc * 1e-12

    def couple(x, s):
        return x * (1.0 + 1e-12 * s).astype(x.dtype)

    def fwd_bwd_rep(mod, x):
        variables = mod.init(key, x, train=True)

        def rep(s):
            def loss(v, xx):
                out, _ = mod.apply(v, xx, train=True,
                                   mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32))

            val, (gv, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                variables, couple(x, s)
            )
            return (val + consume(gv)
                    + jnp.mean(gx.astype(jnp.float32)))

        return rep

    # equality check first: one-pass == two-pass (fresh stats, f32 tol)
    v2 = JustBN2().init(key, x64, train=True)
    v1 = JustBN1().init(key, x64, train=True)
    o2, s2_ = JustBN2().apply(v2, x64, train=True,
                              mutable=["batch_stats"])
    o1, s1_ = JustBN1().apply(v1, x64, train=True,
                              mutable=["batch_stats"])
    err = float(jnp.max(jnp.abs(
        o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    verr = float(jnp.max(jnp.abs(
        jax.tree.leaves(s1_)[1] - jax.tree.leaves(s2_)[1])))
    print(f"equality: max|out1-out2|={err:.3e} "
          f"max|var1-var2|={verr:.3e}", file=sys.stderr)

    reps = {}
    if want("bn2pass"):
        reps["bn2pass"] = fwd_bwd_rep(JustBN2(), x64)
    if want("bn1pass"):
        reps["bn1pass"] = fwd_bwd_rep(JustBN1(), x64)
    if want("tower2"):
        reps["tower2"] = fwd_bwd_rep(tower(Block2), x64)
    if want("tower1"):
        reps["tower1"] = fwd_bwd_rep(tower(Block1), x64)
    if want("tower_nobn"):
        reps["tower_nobn"] = fwd_bwd_rep(tower(Block0), x64)

    def make_chain(rep, n):
        @jax.jit
        def chain(s):
            for _ in range(n):
                s = rep(s)
            return s

        return chain

    def timed(chain):
        s0 = jnp.float32(0.0)
        float(chain(s0))
        for _phase in range(2):
            t0 = time.perf_counter()
            s = s0
            for _ in range(args.iters):
                s = chain(s) * 1e-6
            float(s)
            elapsed = time.perf_counter() - t0
        return elapsed / args.iters

    def slope(rep, name):
        c1 = make_chain(rep, args.n1)
        c2 = make_chain(rep, args.n2)
        t1 = timed(c1)
        t2 = timed(c2)
        ms = (t2 - t1) / (args.n2 - args.n1) * 1e3
        # tower fwd+bwd FLOPs: 32 convs x 2 x M x 64 x 576 x 3 (fwd,
        # dW, dx)
        m = b * hw * hw
        tf = 32 * 2 * m * 64 * 576 * 3 / (ms * 1e-3) / 1e12
        extra = f"  ({tf:6.1f} TF/s)" if name.startswith("tower") else ""
        print(f"{name:12s} {ms:8.3f} ms/rep{extra}   "
              f"(n1 {t1 * 1e3:7.2f}, n2 {t2 * 1e3:7.2f})")
        return ms

    if reps:
        timed(make_chain(next(iter(reps.values())), 1))

    names = list(reps)
    if args.order == "swapped":
        names = names[::-1]
    results = {}
    for name in names:
        results[name] = slope(reps[name], name)
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
