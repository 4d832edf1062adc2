"""Section-level profile of the SRGAN pretrain step (run on real TPU).

Decomposes the 96px/batch-128 pretrain step (trainer.pretrain_step)
into its generator sections and overhead components, each timed with
the repo's honest protocol: scalar-coupled reps chained INSIDE one jit,
slope across two chain lengths (cancels dispatch), a process-level
throwaway phase, two measured phases per program keeping the second.

    python tools/profile_pretrain.py [--batch 128] [--crop 96]
        [--components conv1,tower,...]

Sections (fwd+bwd = grads wrt params and input):
  conv1      9x9 3->64 + PReLU at LR
  tower      16 residual blocks (conv-BN-PReLU-conv-BN + skip) at LR
  bn1        ONE train-mode BatchNorm at the tower shape (x33 ~ BN share)
  trunk      conv2 + bn2 + long-skip add
  up0        subpixel stage 0: conv 64->256 + d2s + PReLU (LR -> 2x)
  up1        subpixel stage 1, shuffle=False (pre-d2s output)
  head       partially-folded 9x9 head conv from the (2x, 256) tensor
  adam       one apply_updates over the generator param tree
  synth      on-device LR/HR pair synthesis
  gen_fwd / gen_fwd_bwd   whole generator
  step_device             full pretrain step, in-jit chain slope
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from argparse import Namespace


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=4)
    ap.add_argument("--components", default="",
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()
    only = set(filter(None, args.components.split(",")))

    def want(name):
        return not only or name in only

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.data.preprocess import synthesize_pair
    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.models.layers import BatchNorm, Conv, PReLU
    from torchsr_tpu.models.layers import SubpixelSpaceConv
    from torchsr_tpu.models.srgan import ResidualBlock, SubpixelConv
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.state import apply_updates
    from torchsr_tpu.train.trainer import SRGANTrainer

    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    targs = Namespace(
        batch_size=args.batch, disable_amp=False, epochs=1,
        pretrain_epochs=1, gan_checkpoint=None, psnr_checkpoint=None,
        seed=0, skip_image_save=True, model="srgan",
    )
    tl = SyntheticTrainLoader(args.batch, args.crop, n_batches=2)
    el = SyntheticEvalLoader(args.batch, args.crop, n_batches=1)
    trainer = SRGANTrainer(
        targs, tl, el, tl.dataset_len, el.dataset_len, mesh, ctx
    )
    state = trainer.state
    opt = trainer.opt

    dt = jnp.bfloat16
    b = args.batch
    lr_hw = args.crop // 4
    rng = np.random.default_rng(0)

    def mk(shape, dtype=dt):
        return jnp.asarray(rng.normal(0, 0.5, shape), dtype)

    x3 = mk((b, lr_hw, lr_hw, 3))            # LR input
    t64 = mk((b, lr_hw, lr_hw, 64))          # tower shape
    u64 = mk((b, 2 * lr_hw, 2 * lr_hw, 64))  # after upsample0
    y256 = mk((b, 2 * lr_hw, 2 * lr_hw, 256))  # pre-d2s (up1 out)

    key = jax.random.PRNGKey(0)

    def section(mod, x, train_kw=True):
        """(params_or_vars, apply_fn(variables, x)) for a module."""
        kw = {"train": True} if train_kw else {}
        variables = mod.init(key, x, **kw)
        if train_kw and "batch_stats" in variables:
            def apply(v, xx):
                out, _ = mod.apply(v, xx, train=True,
                                   mutable=["batch_stats"])
                return out
        elif train_kw:
            def apply(v, xx):
                return mod.apply(v, xx, train=True)
        else:
            def apply(v, xx):
                return mod.apply(v, xx)
        return variables, apply

    def couple(x, s):
        return x * (1.0 + 1e-12 * s).astype(x.dtype)

    def consume(tree):
        """Scalar depending on EVERY leaf.  Consuming only one leaf
        lets XLA dead-code-eliminate the other leaves' producers —
        e.g. all but one dW GEMM of a backward pass (this bug
        understated every fwd+bwd component before round 3's
        correction; see docs/benchmarks.md)."""
        acc = jnp.float32(0.0)
        for leaf in jax.tree.leaves(tree):
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc * 1e-12

    def fwd_bwd_rep(mod, x, train_kw=True):
        variables, apply = section(mod, x, train_kw)

        def rep(s):
            def loss(v, xx):
                out = apply(v, xx)
                return jnp.mean(out.astype(jnp.float32))

            val, (gv, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                variables, couple(x, s)
            )
            return (val + consume(gv)
                    + jnp.mean(gx.astype(jnp.float32)))

        return rep

    import flax.linen as nn

    class Tower16(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for i in range(16):
                x = ResidualBlock(64, dtype=dt, name=f"block{i}")(
                    x, train=train
                )
            return x

    class Conv1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            out = Conv(64, (9, 9), dtype=dt, name="conv1")(x)
            return PReLU(name="prelu1")(out)

    class Trunk(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            out = Conv(64, (3, 3), use_bias=False, dtype=dt,
                       name="conv2")(x)
            out = BatchNorm(use_running_average=not train, dtype=dt,
                            name="bn2")(out)
            return out + x

    class BN1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return BatchNorm(use_running_average=not train, dtype=dt,
                             name="bn")(x)

    reps = {}
    if want("conv1"):
        reps["conv1"] = fwd_bwd_rep(Conv1(), x3)
    if want("tower"):
        reps["tower"] = fwd_bwd_rep(Tower16(), t64)
    if want("bn1"):
        reps["bn1"] = fwd_bwd_rep(BN1(), t64)
    if want("trunk"):
        reps["trunk"] = fwd_bwd_rep(Trunk(), t64)
    if want("up0"):
        reps["up0"] = fwd_bwd_rep(
            SubpixelConv(64, dtype=dt), t64, train_kw=False
        )
    if want("up1"):
        reps["up1"] = fwd_bwd_rep(
            SubpixelConv(64, dtype=dt, shuffle=False), u64,
            train_kw=False,
        )
    if want("head"):
        reps["head"] = fwd_bwd_rep(
            SubpixelSpaceConv(3, (9, 9), 4, dtype=dt, in_fold=2),
            y256, train_kw=False,
        )

    gen_params, gen_stats = state.gen_params, state.gen_stats

    if want("adam"):
        fake_g = jax.tree.map(jnp.zeros_like, gen_params)

        def rep_adam(s):
            g = jax.tree.map(lambda x: x + 1e-20 * s, fake_g)
            p1, _ = apply_updates(
                gen_params, g, state.psnr_opt_state, opt, 1e-4
            )
            return consume(p1)

        reps["adam"] = rep_adam

    crops0, flips0 = trainer._put(*next(iter(tl.epoch(0))))
    if want("synth"):
        def rep_synth(s):
            cr = (crops0.astype(jnp.float32) + s * 1e-12).astype(
                crops0.dtype
            )
            lr_i, hr_i = synthesize_pair(cr, flips0, upscale_factor=4)
            return (jnp.mean(lr_i.astype(jnp.float32))
                    + jnp.mean(hr_i.astype(jnp.float32)))

        reps["synth"] = rep_synth

    gen_t = trainer.gen_train

    def gen_apply(p, stats, x):
        out, _ = gen_t.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return out

    lrimg = mk((b, lr_hw, lr_hw, 3), jnp.float32)
    if want("gen_fwd"):
        def rep_gen_fwd(s):
            out = gen_apply(gen_params, gen_stats, couple(lrimg, s))
            return jnp.mean(out.astype(jnp.float32))

        reps["gen_fwd"] = rep_gen_fwd
    if want("gen_fwd_bwd"):
        def rep_gen_fwd_bwd(s):
            def loss(p):
                out = gen_apply(p, gen_stats, couple(lrimg, s))
                return jnp.mean(out.astype(jnp.float32))

            val, grads = jax.value_and_grad(loss)(gen_params)
            return val + consume(grads)

        reps["gen_fwd_bwd"] = rep_gen_fwd_bwd

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
        print(f"{name:12s} {ms:8.3f} ms/rep   "
              f"(n1 {t1 * 1e3:7.2f} ms, n2 {t2 * 1e3:7.2f} ms)",
              file=sys.stderr)
        return ms

    # Throwaway phase on something cheap.
    if reps:
        timed(make_chain(next(iter(reps.values())), 1))

    results = {name: slope(rep, name) for name, rep in reps.items()}

    # In-context ablations: the same step structure with pieces removed,
    # all slope-timed over donated state chains.  core = synth + loss +
    # grads only (params constant, no update); core_sgd additionally
    # threads params (one cheap kernel per leaf) and BN stats, i.e. the
    # full serialization structure minus Adam; step_device is the real
    # step (tree Adam + opt state + counter).  Differences attribute
    # the step's slope-invisible share.
    if want("core") or want("core_sgd") or want("step_device"):
        batches = [trainer._put(c, f) for c, f in tl.epoch(0)]
        (b0c, b0f), (b1c, b1f) = batches[0], batches[1]
        core = trainer._pretrain_core

    def timed_arg_chain(chain, init):
        st = jax.tree.map(lambda x: x + 0, init)
        st, acc = chain(st, b0c, b0f, b1c, b1f)
        float(acc)
        for _phase in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, acc = chain(st, b0c, b0f, b1c, b1f)
            float(acc)
            elapsed = time.perf_counter() - t0
        return elapsed / args.iters

    def chain_slope(make_chain, init, name, n1=1, n2=3):
        t1 = timed_arg_chain(make_chain(n1), init)
        t2 = timed_arg_chain(make_chain(n2), init)
        ms = (t2 - t1) / (n2 - n1) * 1e3
        print(f"{name:12s} {ms:8.3f} ms "
              f"(chain{n1} {t1 * 1e3:.2f}, chain{n2} {t2 * 1e3:.2f})",
              file=sys.stderr)
        return ms

    if want("core"):
        def make_core_chain(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain(s, b0c, b0f, b1c, b1f):
                for i in range(n):
                    c, fl = (b0c, b0f) if i % 2 == 0 else (b1c, b1f)
                    # Couple the input to the previous rep's scalar so
                    # the reps serialize (one extra u8 pass, ~0 cost).
                    c = (c.astype(jnp.float32) + s * 1e-30).astype(
                        c.dtype
                    )
                    loss, _stats, grads = core(
                        gen_params, gen_stats, c, fl
                    )
                    s = loss + consume(grads)
                return s, s

            return chain

        results["core"] = chain_slope(
            make_core_chain, jnp.float32(0.0), "core"
        )

    if want("core_args"):
        # Params/stats as traced ARGUMENTS (not closure constants),
        # threaded through UNCHANGED: separates "weights are runtime
        # buffers" from "weights change every step".
        def make_args_chain(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain(carry, b0c, b0f, b1c, b1f):
                p, stats, s = carry
                for i in range(n):
                    c, fl = (b0c, b0f) if i % 2 == 0 else (b1c, b1f)
                    c = (c.astype(jnp.float32) + s * 1e-30).astype(
                        c.dtype
                    )
                    loss, _stats, grads = core(p, stats, c, fl)
                    s = loss + consume(grads)
                return (p, stats, s), s

            return chain

        results["core_args"] = chain_slope(
            make_args_chain,
            (gen_params, gen_stats, jnp.float32(0.0)),
            "core_args",
        )

    if want("stats_only"):
        # Thread the BN running stats per rep; params stay unchanged
        # args.  Isolates the stat-threading share.
        def make_stats_chain(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain(carry, b0c, b0f, b1c, b1f):
                p, stats = carry
                acc = jnp.float32(0.0)
                for i in range(n):
                    c, fl = (b0c, b0f) if i % 2 == 0 else (b1c, b1f)
                    c = (c.astype(jnp.float32) + acc * 1e-30).astype(
                        c.dtype
                    )
                    loss, stats, _grads = core(p, stats, c, fl)
                    acc = acc + loss
                return (p, stats), acc

            return chain

        results["stats_only"] = chain_slope(
            make_stats_chain, (gen_params, gen_stats), "stats_only"
        )

    if want("sgd_nostats"):
        # Params updated per rep (one fused kernel per leaf); stats
        # unchanged.  Isolates the params-change share.
        def make_sgdns_chain(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain(carry, b0c, b0f, b1c, b1f):
                p, stats = carry
                acc = jnp.float32(0.0)
                for i in range(n):
                    c, fl = (b0c, b0f) if i % 2 == 0 else (b1c, b1f)
                    loss, _stats, grads = core(p, stats, c, fl)
                    p = jax.tree.map(
                        lambda a, g: a - 1e-4 * g.astype(a.dtype),
                        p, grads,
                    )
                    acc = acc + loss
                return (p, stats), acc

            return chain

        results["sgd_nostats"] = chain_slope(
            make_sgdns_chain, (gen_params, gen_stats), "sgd_nostats"
        )

    if want("core_sgd"):
        def make_sgd_chain(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain(carry, b0c, b0f, b1c, b1f):
                p, stats = carry
                acc = jnp.float32(0.0)
                for i in range(n):
                    c, fl = (b0c, b0f) if i % 2 == 0 else (b1c, b1f)
                    loss, stats, grads = core(p, stats, c, fl)
                    p = jax.tree.map(
                        lambda a, g: a - 1e-4 * g.astype(a.dtype),
                        p, grads,
                    )
                    acc = acc + loss
                return (p, stats), acc

            return chain

        results["core_sgd"] = chain_slope(
            make_sgd_chain, (gen_params, gen_stats), "core_sgd"
        )

    if want("step_device"):

        def make_step_chain(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain(st, b0c, b0f, b1c, b1f):
                acc = jnp.float32(0.0)
                for i in range(n):
                    c, fl = (b0c, b0f) if i % 2 == 0 else (b1c, b1f)
                    st, loss = trainer.pretrain_step(st, c, fl)
                    acc = acc + loss
                return st, acc

            return chain

        def timed_state_chain(chain):
            st = jax.tree.map(lambda x: x + 0, state)
            st, acc = chain(st, b0c, b0f, b1c, b1f)
            float(acc)
            for _phase in range(2):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, acc = chain(st, b0c, b0f, b1c, b1f)
                float(acc)
                elapsed = time.perf_counter() - t0
            return elapsed / args.iters

        t1 = timed_state_chain(make_step_chain(1))
        t2 = timed_state_chain(make_step_chain(3))
        results["step_device"] = (t2 - t1) / 2 * 1e3
        print(f"{'step_device':12s} {results['step_device']:8.3f} ms "
              f"(chain1 {t1 * 1e3:.2f}, chain3 {t2 * 1e3:.2f})",
              file=sys.stderr)

    if not only and "tower" in results:
        sections = sum(
            results.get(k, 0.0)
            for k in ("conv1", "tower", "trunk", "up0", "up1", "head",
                      "adam", "synth")
        )
        print(f"\nsum(sections) = {sections:.2f} ms vs step_device "
              f"{results.get('step_device', float('nan')):.2f} ms; "
              f"BN share ~ 33 x bn1 = {33 * results.get('bn1', 0):.2f} ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()
