"""Component-level profile of the ESRGAN GAN step (run on real TPU).

Decomposes the full adversarial step (train/trainer.py gan_step) into
its constituent programs and times each with the repo's honest-timing
protocol: a chain of N reps INSIDE one jit (scalar-coupled so XLA
cannot reorder or elide), slope method across two chain lengths to
cancel per-call dispatch, a process-level throwaway phase, and two
measured phases per program keeping the second.

    python tools/profile_gan_step.py [--batch 32] [--crop 128]

Components:
  gen_fwd        generator forward (train apply, fused Pallas RDB)
  gen_fwd_bwd    generator forward + vjp backward (params cotangent)
  disc_fwd       one discriminator forward (train mode, BN stats)
  dloss_fwd_bwd  disc update loss: 2 disc forwards + backward
  vgg_fwd        one VGG19 relu5_4 forward
  head_fwd_bwd   gen-update head: VGG(sr)+VGG(hr)+D(hr)+D(sr), grad wrt sr
  full_step      the actual jitted gan_step (cross-check)

The sum of components should roughly reproduce full_step; the gap is
Adam/synthesis/fusion slack.
"""

from __future__ import annotations

import argparse
import sys
import time
from argparse import Namespace


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=3)
    args = ap.parse_args()

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.trainer import ESRGANTrainer

    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    targs = Namespace(
        batch_size=args.batch, disable_amp=False, epochs=1,
        pretrain_epochs=1, gan_checkpoint=None, psnr_checkpoint=None,
        seed=0, skip_image_save=True, model="esrgan",
    )
    tl = SyntheticTrainLoader(args.batch, args.crop, n_batches=2)
    el = SyntheticEvalLoader(args.batch, args.crop, n_batches=1)
    trainer = ESRGANTrainer(
        targs, tl, el, tl.dataset_len, el.dataset_len, mesh, ctx
    )
    state = trainer.state
    vgg_params = trainer.vgg_params
    gen_t, disc_t, vgg = trainer.gen_train, trainer.disc_train, trainer.vgg

    rng = np.random.default_rng(0)
    lr_hw = args.crop // 4
    lr_img = jnp.asarray(
        rng.random((args.batch, lr_hw, lr_hw, 3)), jnp.float32
    )
    hr_img = jnp.asarray(
        rng.random((args.batch, args.crop, args.crop, 3)), jnp.float32
    )

    gen_params, gen_stats = state.gen_params, state.gen_stats
    disc_params, disc_stats = state.disc_params, state.disc_stats

    def gen_apply(p, x):
        variables = {"params": p}
        if gen_stats:
            variables["batch_stats"] = gen_stats
            out, _ = gen_t.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
            return out
        return gen_t.apply(variables, x, train=True)

    def disc_apply(p, stats, x):
        out, mut = disc_t.apply(
            {"params": p, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    disc_loss_fn, gen_loss_terms = trainer._disc_gen_losses()
    import torchsr_tpu.train.losses as L

    # --- component rep functions: scalar-coupled (s: f32) --------------
    def couple(x, s):
        return x * (1.0 + 1e-12 * s).astype(x.dtype)

    def rep_gen_fwd(s):
        out = gen_apply(gen_params, couple(lr_img, s))
        return jnp.mean(out.astype(jnp.float32))

    def rep_gen_fwd_bwd(s):
        def loss(p):
            out = gen_apply(p, couple(lr_img, s))
            return jnp.mean(out.astype(jnp.float32))

        val, grads = jax.value_and_grad(loss)(gen_params)
        leaf = jax.tree.leaves(grads)[0]
        return val + jnp.mean(leaf.astype(jnp.float32))

    def rep_disc_fwd(s):
        out, _ = disc_apply(disc_params, disc_stats, couple(hr_img, s))
        return jnp.mean(out.astype(jnp.float32))

    def rep_dloss_fwd_bwd(s):
        def d_loss(p):
            real, st1 = disc_apply(p, disc_stats, couple(hr_img, s))
            fake, _ = disc_apply(p, st1, couple(lr_img_up, s))
            return disc_loss_fn(real, fake)

        val, grads = jax.value_and_grad(d_loss)(disc_params)
        leaf = jax.tree.leaves(grads)[0]
        return val + jnp.mean(leaf.astype(jnp.float32))

    def rep_vgg_fwd(s):
        out = vgg.apply({"params": vgg_params}, couple(hr_img, s))
        return jnp.mean(out.astype(jnp.float32))

    def rep_head_fwd_bwd(s):
        hr_sg = jax.lax.stop_gradient(hr_img)

        def head_loss(sr2):
            feat_sr = vgg.apply({"params": vgg_params}, sr2)
            feat_hr = vgg.apply({"params": vgg_params}, hr_sg)
            content = L.l1_loss(feat_sr, feat_hr)
            loss, _ = gen_loss_terms(
                lambda p, st, x: disc_apply(p, st, x),
                disc_params, disc_stats, sr2, hr_sg, content,
            )
            return loss

        val, g = jax.value_and_grad(head_loss)(couple(hr_img, s))
        return val + jnp.mean(g.astype(jnp.float32))

    lr_img_up = hr_img  # disc fake input placeholder (same HR shape)

    def make_chain(rep, n):
        @jax.jit
        def chain(s):
            for _ in range(n):
                s = rep(s)
            return s

        return chain

    def timed(chain):
        s0 = jnp.float32(0.0)
        float(chain(s0))  # compile + warmup readback
        for _phase in range(2):
            t0 = time.perf_counter()
            s = s0
            for _ in range(args.iters):
                s = chain(s) * 1e-6
            float(s)
            elapsed = time.perf_counter() - t0
        return elapsed / args.iters

    def slope(rep, name, n2=None):
        n2 = n2 or args.n2
        c1 = make_chain(rep, args.n1)
        c2 = make_chain(rep, n2)
        t1 = timed(c1)
        t2 = timed(c2)
        ms = (t2 - t1) / (n2 - args.n1) * 1e3
        print(f"{name:16s} {ms:8.2f} ms/rep   "
              f"(n1 {t1 * 1e3:7.2f} ms, n2 {t2 * 1e3:7.2f} ms)",
              file=sys.stderr)
        return ms

    # Throwaway phase: absorb the process-level first-timing-loop
    # penalty on something cheap before any recorded number.
    timed(make_chain(rep_disc_fwd, 1))

    results = {}
    results["disc_fwd"] = slope(rep_disc_fwd, "disc_fwd")
    results["dloss_fwd_bwd"] = slope(rep_dloss_fwd_bwd, "dloss_fwd_bwd")
    results["vgg_fwd"] = slope(rep_vgg_fwd, "vgg_fwd")
    results["head_fwd_bwd"] = slope(rep_head_fwd_bwd, "head_fwd_bwd")
    # gen chains compile slowly (345 unrolled convs per rep): keep n2=2
    results["gen_fwd"] = slope(rep_gen_fwd, "gen_fwd", n2=2)
    results["gen_fwd_bwd"] = slope(rep_gen_fwd_bwd, "gen_fwd_bwd", n2=2)

    # Full step cross-check (already-jitted trainer step, chained).
    batches = [trainer._put(c, f) for c, f in tl.epoch(0)]
    crops, flips = batches[0]
    st = state
    for _ in range(2):
        st, m = trainer.gan_step(st, crops, flips, 1e-4, 1e-4, vgg_params)
    float(m["gen_loss"])
    for _phase in range(2):
        t0 = time.perf_counter()
        for i in range(args.iters):
            crops, flips = batches[i % len(batches)]
            st, m = trainer.gan_step(
                st, crops, flips, 1e-4, 1e-4, vgg_params
            )
        float(m["gen_loss"])
        elapsed = time.perf_counter() - t0
    results["full_step"] = elapsed / args.iters * 1e3
    print(f"{'full_step':16s} {results['full_step']:8.2f} ms",
          file=sys.stderr)

    approx = (results["gen_fwd_bwd"] + results["dloss_fwd_bwd"]
              + results["head_fwd_bwd"])
    print(f"\nsum(gen_fwd_bwd + dloss + head) = {approx:.2f} ms vs "
          f"full_step {results['full_step']:.2f} ms "
          f"(gap = Adam + synthesis + vjp-vs-grad structure)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
