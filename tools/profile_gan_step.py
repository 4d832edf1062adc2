"""Component-level profile of the GAN step (run on real TPU).

Decomposes the full adversarial step (train/trainer.py gan_step) into
its constituent programs and times each with the repo's honest-timing
protocol: a chain of N reps INSIDE one jit (scalar-coupled so XLA
cannot reorder or elide), slope method across two chain lengths to
cancel per-call dispatch, a process-level throwaway phase, and two
measured phases per program keeping the second.

    python tools/profile_gan_step.py [--model esrgan|srgan]
        [--components a,b,c]   # default: the slope components

Slope components (per-rep device cost):
  gen_fwd        generator forward (train apply, fused Pallas RDB)
  gen_fwd_bwd    generator forward + vjp backward (params cotangent)
  disc_fwd       one discriminator forward (train mode, BN stats)
  dloss_fwd_bwd  disc update loss: 2 disc forwards + backward
  vgg_fwd        one VGG19 relu5_4 forward
  vgg_fwd_bwd    VGG forward + backward wrt input (VGG(sr)'s head cost)
  head_fwd_bwd   gen-update head: VGG(sr)+VGG(hr)+D(hr)+D(sr), grad wrt sr
  adam3 / synth  optimizer trio / on-device pair synthesis

Per-call probes (overhead anatomy; see docs/benchmarks.md):
  statepass_noop   donated TRUE no-op over the per-leaf state tree
  packedpass_noop  same through per-dtype flat buffers
  statepass        donated per-leaf touch (adds ~1 kernel per leaf)
  packcost         device cost of one unpack->touch->pack round trip
  step_device      full step chained in-jit (slope) = true device time
  full_step        the jitted per-leaf gan_step as a per-call loop
  full_step_packed the packed-native flat-Adam variant

ESRGAN round-3 findings: components sum 63 ms, step_device 76.7,
full_step 82.5 — marshalling (19.4 ms/call) overlaps compute; the
14 ms slope-invisible share is per-leaf optimizer/stat kernels and
scheduling slack.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from argparse import Namespace


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="esrgan",
                    choices=["esrgan", "srgan"])
    ap.add_argument("--batch", type=int, default=0,
                    help="default: 32 for esrgan, 128 for srgan")
    ap.add_argument("--crop", type=int, default=0,
                    help="default: 128 for esrgan, 96 for srgan")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n1", type=int, default=1)
    ap.add_argument("--n2", type=int, default=3)
    ap.add_argument("--components", default="",
                    help="comma-separated subset to run (default: all)")
    args = ap.parse_args()
    only = set(filter(None, args.components.split(",")))

    def want(name):
        return not only or name in only

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
    from torchsr_tpu.train.trainer import ESRGANTrainer, SRGANTrainer

    esr = args.model == "esrgan"
    args.batch = args.batch or (32 if esr else 128)
    args.crop = args.crop or (128 if esr else 96)
    trainer_cls = ESRGANTrainer if esr else SRGANTrainer
    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    targs = Namespace(
        batch_size=args.batch, disable_amp=False, epochs=1,
        pretrain_epochs=1, gan_checkpoint=None, psnr_checkpoint=None,
        seed=0, skip_image_save=True, model=args.model,
    )
    tl = SyntheticTrainLoader(args.batch, args.crop, n_batches=2)
    el = SyntheticEvalLoader(args.batch, args.crop, n_batches=1)
    trainer = trainer_cls(
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

    def rep_gen_fwd(s):
        out = gen_apply(gen_params, couple(lr_img, s))
        return jnp.mean(out.astype(jnp.float32))

    def rep_gen_fwd_bwd(s):
        def loss(p):
            out = gen_apply(p, couple(lr_img, s))
            return jnp.mean(out.astype(jnp.float32))

        val, grads = jax.value_and_grad(loss)(gen_params)
        return val + consume(grads)

    def rep_disc_fwd(s):
        out, _ = disc_apply(disc_params, disc_stats, couple(hr_img, s))
        return jnp.mean(out.astype(jnp.float32))

    def rep_dloss_fwd_bwd(s):
        def d_loss(p):
            real, st1 = disc_apply(p, disc_stats, couple(hr_img, s))
            fake, _ = disc_apply(p, st1, couple(lr_img_up, s))
            return disc_loss_fn(real, fake)

        val, grads = jax.value_and_grad(d_loss)(disc_params)
        return val + consume(grads)

    def rep_vgg_fwd(s):
        out = vgg.apply({"params": vgg_params}, couple(hr_img, s))
        return jnp.mean(out.astype(jnp.float32))

    def rep_vgg_fwd_bwd(s):
        """VGG forward + backward wrt its INPUT — the marginal cost
        VGG(sr) adds inside the head (params get no cotangent there;
        the reference keeps VGG frozen, loss.py:28-34)."""
        feat_hr = jax.lax.stop_gradient(
            vgg.apply({"params": vgg_params}, hr_img)
        )

        def loss(x):
            return L.l1_loss(vgg.apply({"params": vgg_params}, x), feat_hr)

        val, g = jax.value_and_grad(loss)(couple(hr_img, s))
        return val + jnp.mean(g.astype(jnp.float32))

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


    # Adam/synthesis reps: the profile's residual "gap" components.
    from torchsr_tpu.data.preprocess import synthesize_pair
    from torchsr_tpu.train.state import apply_updates

    opt = trainer.opt
    fake_ggrads = jax.tree.map(jnp.zeros_like, gen_params)
    fake_dgrads = jax.tree.map(jnp.zeros_like, disc_params)
    crops0, flips0 = trainer._put(*next(iter(tl.epoch(0))))

    def rep_adam3(s):
        lr = 1e-4 * (1.0 + 1e-12 * s)
        g = jax.tree.map(lambda x: x + 1e-20 * s, fake_ggrads)
        dg = jax.tree.map(lambda x: x + 1e-20 * s, fake_dgrads)
        p1, _ = apply_updates(gen_params, g, state.gen_opt_state, opt, lr)
        p2, _ = apply_updates(
            disc_params, dg, state.disc_opt_state, opt, lr
        )
        p3, _ = apply_updates(gen_params, g, state.psnr_opt_state, opt, lr)
        return consume(p1) + consume(p2) + consume(p3)

    def rep_synth(s):
        cr = (crops0.astype(jnp.float32) + s * 1e-12).astype(crops0.dtype)
        lr_i, hr_i = synthesize_pair(cr, flips0, upscale_factor=4)
        return (jnp.mean(lr_i.astype(jnp.float32))
                + jnp.mean(hr_i.astype(jnp.float32)))

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
    for name, rep, n2 in (
        ("adam3", rep_adam3, None),
        ("synth", rep_synth, None),
        ("disc_fwd", rep_disc_fwd, None),
        ("dloss_fwd_bwd", rep_dloss_fwd_bwd, None),
        ("vgg_fwd", rep_vgg_fwd, None),
        ("vgg_fwd_bwd", rep_vgg_fwd_bwd, None),
        # gen chains compile slowly (345 unrolled convs/rep): n2=2
        ("head_fwd_bwd", rep_head_fwd_bwd, None),
        ("gen_fwd", rep_gen_fwd, 2),
        ("gen_fwd_bwd", rep_gen_fwd_bwd, 2),
    ):
        if want(name):
            results[name] = slope(rep, name, n2=n2)

    # Packed-boundary full step (the production epoch-loop path).
    # Runs BEFORE statepass/full_step: pack does not donate, so the
    # state stays live for them; they donate it.
    if want("full_step_packed"):
        batches = [trainer._put(c, f) for c, f in tl.epoch(0)]
        packed = trainer.pack_state(state)
        crops, flips = batches[0]
        for _ in range(2):
            packed, m = trainer.gan_step_packed(
                packed, crops, flips, 1e-4, 1e-4, vgg_params
            )
        float(m["gen_loss"])
        for _phase in range(2):
            t0 = time.perf_counter()
            for i in range(args.iters):
                crops, flips = batches[i % len(batches)]
                packed, m = trainer.gan_step_packed(
                    packed, crops, flips, 1e-4, 1e-4, vgg_params
                )
            float(m["gen_loss"])
            elapsed = time.perf_counter() - t0
        results["full_step_packed"] = elapsed / args.iters * 1e3
        print(f"{'full_step_packed':16s} "
              f"{results['full_step_packed']:8.2f} ms", file=sys.stderr)

    # DEVICE time of one full per-leaf GAN step: chains of the whole
    # step body inside ONE jit (slope over n=1 vs n=2 cancels every
    # per-call cost).  The gap between this and the per-call full_step
    # wall time is what a device-side multi-step loop could reclaim.
    if want("step_device"):
        batches = [trainer._put(c, f) for c, f in tl.epoch(0)]
        (b0c, b0f), (b1c, b1f) = batches[0], batches[1]

        def make_step_chain(n):
            @functools.partial(jax.jit, donate_argnums=(0,))
            def chain(st, b0c, b0f, b1c, b1f, vgg):
                acc = jnp.float32(0.0)
                for i in range(n):
                    c, fl = (b0c, b0f) if i % 2 == 0 else (b1c, b1f)
                    st, m = trainer.gan_step(st, c, fl, 1e-4, 1e-4, vgg)
                    acc = acc + m["gen_loss"]
                return st, acc

            return chain

        def timed_state_chain(chain):
            import jax.tree_util as jtu

            st = jax.tree.map(lambda x: x + 0, state)  # fresh copy
            st, acc = chain(st, b0c, b0f, b1c, b1f, vgg_params)
            float(acc)
            for _phase in range(2):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    st, acc = chain(st, b0c, b0f, b1c, b1f, vgg_params)
                float(acc)
                elapsed = time.perf_counter() - t0
            return elapsed / args.iters

        t1 = timed_state_chain(make_step_chain(1))
        t2 = timed_state_chain(make_step_chain(2))
        results["step_device"] = (t2 - t1) * 1e3
        print(f"{'step_chain1':16s} {t1 * 1e3:8.2f} ms\n"
              f"{'step_chain2':16s} {t2 * 1e3:8.2f} ms\n"
              f"{'step_device':16s} {results['step_device']:8.2f} ms",
              file=sys.stderr)

    # Device cost of the packed boundary itself: chains of
    # "unpack -> touch every leaf -> pack" vs "touch every leaf" run
    # INSIDE one jit (slope method over two chain lengths).  The
    # difference is what one unpack+pack round trip adds on top of the
    # per-leaf work the real step performs anyway.
    if want("packcost"):
        packer = trainer.packer
        bufs0 = trainer.pack_state(state)

        def touch(st, s):
            return jax.tree.map(
                lambda x: (x * (1.0 + 1e-12 * s).astype(x.dtype))
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                st,
            )

        def make_tree_chain(n):
            @jax.jit
            def chain(st, s):
                for _ in range(n):
                    st = touch(st, s)
                    s = s + jnp.mean(
                        jax.tree.leaves(st)[0].astype(jnp.float32)
                    ) * 1e-20
                return st, s
            return chain

        def make_packed_chain(n):
            @jax.jit
            def chain(bufs, s):
                for _ in range(n):
                    st = packer.unpack(bufs)
                    st = touch(st, s)
                    bufs = packer.pack(st)
                    s = s + jnp.mean(
                        jax.tree.leaves(st)[0].astype(jnp.float32)
                    ) * 1e-20
                return bufs, s
            return chain

        def timed_chain(chain, arg):
            s0 = jnp.float32(1.0)
            out, s = chain(arg, s0)
            float(s)
            for _phase in range(2):
                t0 = time.perf_counter()
                a, s = arg, s0
                for _ in range(args.iters):
                    a, s = chain(a, s)
                float(s)
                elapsed = time.perf_counter() - t0
            return elapsed / args.iters

        n1, n2 = 1, 4
        t_tree = (timed_chain(make_tree_chain(n2), state)
                  - timed_chain(make_tree_chain(n1), state)) / (n2 - n1)
        t_packed = (timed_chain(make_packed_chain(n2), bufs0)
                    - timed_chain(make_packed_chain(n1), bufs0)) \
            / (n2 - n1)
        results["packcost"] = (t_packed - t_tree) * 1e3
        print(f"{'touch_tree':16s} {t_tree * 1e3:8.2f} ms/rep\n"
              f"{'touch_packed':16s} {t_packed * 1e3:8.2f} ms/rep\n"
              f"{'packcost':16s} {results['packcost']:8.2f} ms/rep",
              file=sys.stderr)

    # TRUE no-op state pass: donated identity on every leaf (XLA
    # aliases input to output, zero device kernels) — pure host/tunnel
    # argument marshalling for the per-leaf call convention.
    if want("statepass_noop"):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def pass_noop(st, s):
            return st, s + 1.0

        st, s = state, jnp.float32(0.0)
        st, s = pass_noop(st, s)
        float(s)
        for _phase in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, s = pass_noop(st, s)
            float(s)
            elapsed = time.perf_counter() - t0
        results["statepass_noop"] = elapsed / args.iters * 1e3
        print(f"{'statepass_noop':16s} "
              f"{results['statepass_noop']:8.2f} ms", file=sys.stderr)
        state = st

    # Packed no-op: the same donated identity but through the packed
    # boundary (a handful of buffers).  statepass_noop minus this is
    # the marshalling cost packing can actually remove.
    if want("packedpass_noop"):
        packed0 = trainer.pack_state(state)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def pass_packed(bufs, s):
            return bufs, s + 1.0

        pk, s = packed0, jnp.float32(0.0)
        pk, s = pass_packed(pk, s)
        float(s)
        for _phase in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                pk, s = pass_packed(pk, s)
            float(s)
            elapsed = time.perf_counter() - t0
        results["packedpass_noop"] = elapsed / args.iters * 1e3
        print(f"{'packedpass_noop':16s} "
              f"{results['packedpass_noop']:8.2f} ms", file=sys.stderr)

    # Per-call overhead of passing the full state pytree (donated
    # no-op): isolates host/tunnel argument marshalling from device
    # compute.  Run like full_step — per-call wall, not slope.
    if want("statepass"):
        import jax.tree_util as jtu

        nleaves = len(jtu.tree_leaves(state))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def pass_state(st, s):
            new_gp = jax.tree.map(
                lambda x: (x * (1.0 + 1e-12 * s).astype(x.dtype)),
                st.gen_params,
            )
            return st.replace(gen_params=new_gp), s + 1.0

        st, s = state, jnp.float32(0.0)
        st, s = pass_state(st, s)
        float(s)
        for _phase in range(2):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, s = pass_state(st, s)
            float(s)
            elapsed = time.perf_counter() - t0
        results["statepass"] = elapsed / args.iters * 1e3
        print(f"{'statepass':16s} {results['statepass']:8.2f} ms "
              f"({nleaves} state leaves)", file=sys.stderr)
        state = st  # donated: rebind so full_step uses live buffers

    # Full step cross-check (already-jitted trainer step, chained).
    # MUST run last: gan_step donates the state, invalidating the
    # param buffers the component reps capture.
    if want("full_step"):
        batches = [trainer._put(c, f) for c, f in tl.epoch(0)]
        crops, flips = batches[0]
        st = state
        for _ in range(2):
            st, m = trainer.gan_step(
                st, crops, flips, 1e-4, 1e-4, vgg_params
            )
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

    if not only:
        approx = (results["gen_fwd_bwd"] + results["dloss_fwd_bwd"]
                  + results["head_fwd_bwd"] + results["adam3"]
                  + results["synth"])
        print(f"\nsum(gen_fwd_bwd + dloss + head + adam3 + synth) = "
              f"{approx:.2f} ms vs full_step {results['full_step']:.2f} ms "
              f"(gap = dispatch + vjp-vs-grad structure + scheduling)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
