"""Two-phase GAN trainers (PSNR pretrain -> adversarial), TPU-native.

Capability parity with the reference trainers
(/root/reference/torchsr/srgan/trainer.py:39-543,
esrgan/trainer.py:39-560), redesigned around JAX:

  * The hot loops are three jitted pure functions —
    ``pretrain_step``, ``gan_step``, ``eval_step`` — compiled once per
    phase, with the training state donated (in-place buffer reuse).
  * Mixed precision is a bfloat16 compute policy (params f32); there is
    no GradScaler because bf16 keeps f32's exponent range.  This covers
    the reference's AMP (and upgrades SRGAN's GAN phase, which the
    reference accidentally leaves in full precision,
    srgan/trainer.py:444-469).
  * Data parallelism: the batch arrives sharded over the mesh's 'data'
    axis and params replicated, so XLA emits one gradient all-reduce
    over ICI per step — the DDP allreduce without DDP.  BatchNorm
    reductions become cross-replica (sync-BN) automatically, which
    upgrades the reference's per-replica stats
    (``broadcast_buffers=False``, srgan/trainer.py:142-157).
  * Eval metrics are computed over the *global* (all-shard) batch —
    the reference logs only rank 0's local shard metrics
    (srgan/trainer.py:296-327).
  * LR schedule: the host computes the StepLR value per epoch and passes
    the scalar into the jitted step.

Loss wiring (identical formulas to the reference, SURVEY.md section 2
#13/#17):
  SRGAN:  pretrain MSE; disc BCE(D(hr),1)+BCE(D(sr'),0);
          gen VGG_L1 + 0.001*BCE(D(sr),1).
  ESRGAN: pretrain L1; relativistic-average disc
          [BCEwL(D(hr)-mean D(sr),1)+BCEwL(D(sr)-mean D(hr),0)]/2;
          gen 0.01*L1 + VGG_L1 + 0.005*BCEwL(D(sr)-mean D(hr),1).
"""

from __future__ import annotations

import functools
import os
import time
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from torchsr_tpu.models import (
    ESRGANDiscriminator,
    ESRGANGenerator,
    SRGANDiscriminator,
    SRGANGenerator,
    VGG19Features,
)
from torchsr_tpu.data.preprocess import (
    synthesize_eval_triple,
    synthesize_pair,
)
from torchsr_tpu.data.prefetch import (
    prefetch_to_device,
    prefetch_to_device_stacked,
)
from torchsr_tpu.parallel.mesh import put_batch, replicate
from torchsr_tpu.train import losses as L
from torchsr_tpu.train.metrics import mse_per_sample, ssim_per_sample
from torchsr_tpu.train.state import (
    GANTrainState,
    StatePacker,
    apply_updates,
    grouped_apply_updates,
    flat_adam,
    init_gan_state,
    make_adam,
    step_lr_schedule,
)
from torchsr_tpu.utils import image_io
from torchsr_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    device_snapshot,
    find_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from torchsr_tpu.utils.logging import Logger
from torchsr_tpu.utils.preemption import (
    PreemptionGuard,
    TrainingPreempted,
)
from torchsr_tpu.utils.profiling import StepProfiler

BASE_LR = 1e-4
SAMPLE_IMAGE_PATH = os.path.join("media", "waterfalls-low-res.png")

# Optimizer-update schedule: "grouped" stacks same-shape leaves so the
# update runs as a few large kernels instead of ~2 tiny kernels per
# tensor (state.grouped_apply_updates; bit-identical math, equivalence
# tested).  Read once at import; A/B via separate processes, like the
# other kernel knobs.  MEASURED AND REJECTED as default (round 3,
# ESRGAN GAN step, order-swapped isolated processes): device slope
# 78.2/77.9 ms grouped vs 75.7/76.4 tree, per-call wall 84.9 vs 83.4 —
# the per-group stack concats cost more than the tiny-kernel soup they
# replace (docs/benchmarks.md "Call-overhead anatomy").  Default tree.
_ADAM_GROUPED = os.environ.get("TORCHSR_ADAM", "tree") == "grouped"


def _opt_apply(params, grads, opt_state, opt, lr):
    if _ADAM_GROUPED:
        return grouped_apply_updates(params, grads, opt_state, lr)
    return apply_updates(params, grads, opt_state, opt, lr)


class GANTrainer:
    """Shared two-phase trainer machinery; subclasses wire the losses."""

    model_name: str = ""
    # How generator gradients are obtained in the GAN step: "vjp" saves
    # the forward's linearization across the disc update (one generator
    # forward per step); "recompute" re-runs the forward inside the gen
    # grad. Chosen per model from v5e measurements (see docs/benchmarks).
    gen_grad_strategy: str = "vjp"
    # Default GAN-phase steps-per-call (see _build_steps; ESRGAN
    # overrides from v5e measurements).
    GAN_STEPS_PER_CALL: int = 8
    # Unroll the GAN multi-step program instead of lax.scan (see
    # gan_multi; K-times compile cost, persistent-cached).
    GAN_MULTI_UNROLL: bool = False

    def __init__(
        self,
        args: Namespace,
        train_loader,
        test_loader,
        train_len: int,
        test_len: int,
        mesh,
        dist_ctx,
        logger: Logger | None = None,
    ) -> None:
        self.args = args
        self.amp = not getattr(args, "disable_amp", False)
        self.batch_size = args.batch_size
        self.best_psnr = -1.0
        self.epochs = args.epochs
        self.pre_epochs = args.pretrain_epochs
        self.gan_checkpoint = getattr(args, "gan_checkpoint", None)
        self.psnr_checkpoint = getattr(args, "psnr_checkpoint", None)
        self.save_image = not getattr(args, "skip_image_save", False)
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.train_len = train_len
        self.test_len = test_len
        self.mesh = mesh
        self.dist = dist_ctx
        self.world_size = dist_ctx.world_size
        self.main_process = dist_ctx.main_process
        self.upscale = getattr(args, "upscale_factor", 4)
        self.crop_size = train_loader.crop_size
        self.seed = getattr(args, "seed", 0) or 0
        self.preempt_save = not getattr(args, "no_preempt_save", False)
        self._preemption: PreemptionGuard | None = None

        # Async checkpointing (default): the device->host fetch is the
        # epoch loop's only non-compute stall (~85 s for a full ESRGAN
        # state through the tunneled runtime) — snapshot on device and
        # let a writer thread stream it out while training continues.
        # Multi-process: the snapshot is a jitted program over the
        # global mesh, so EVERY process participates in it inside
        # ``_save`` (at identical points — the save schedule is driven
        # by replicated values); only the main process owns a writer
        # and enqueues.  The worker's fetch is process-local (the state
        # is fully replicated under DP).
        self.async_saves = not getattr(args, "sync_saves", False)
        self.ckpt_writer = (
            AsyncCheckpointWriter()
            if self.async_saves and self.main_process else None
        )

        self.logger = logger or Logger(
            self.main_process, config=vars(args),
            metrics_path=getattr(args, "metrics_file", None),
        )

        self.profiler = StepProfiler(
            getattr(args, "profile_steps", 0) or 0,
            getattr(args, "profile_dir", None) or "traces",
            self.logger if self.main_process else None,
        )

        global_batch = self.batch_size * jax.process_count()
        n_devices = int(np.prod([d for d in mesh.devices.shape])) \
            if hasattr(mesh.devices, "shape") else len(mesh.devices)
        if global_batch % n_devices != 0:
            raise ValueError(
                f"global batch size {global_batch} (batch-size x "
                f"processes) must be divisible by the {n_devices}-device "
                f"mesh for data-parallel sharding"
            )

        compute_dtype = jnp.bfloat16 if self.amp else jnp.float32
        self._build_models(compute_dtype)
        self._initialize_state()
        self._build_steps()
        self._load_sample_image()

    # ---------------------------------------------------------- models

    def _build_models(self, dtype) -> None:
        raise NotImplementedError

    def _pixel_loss(self, sr, hr):
        """Pretrain/eval loss: MSE for SRGAN, L1 for ESRGAN."""
        raise NotImplementedError

    def _disc_gen_losses(self):
        """Return (disc_loss_fn, gen_extra_fn) — subclass loss wiring."""
        raise NotImplementedError

    def _initialize_state(self) -> None:
        self.opt = make_adam()
        lr_size = self.crop_size // self.upscale
        rng = jax.random.PRNGKey(self.seed)
        state = init_gan_state(
            rng,
            self.gen_train,
            self.disc_train,
            (1, lr_size, lr_size, 3),
            (1, self.crop_size, self.crop_size, 3),
            self.opt,
        )
        vgg_rng = jax.random.PRNGKey(self.seed + 7)
        # jitted for the same reason as init_gan_state: eager flax init
        # pays per-op dispatch through the tunneled runtime.
        vgg_vars = jax.jit(self.vgg.init)(
            vgg_rng, jnp.zeros((1, self.crop_size, self.crop_size, 3))
        )
        vgg_params = vgg_vars["params"]
        vgg_path = getattr(self.args, "vgg_weights", None)
        explicit = bool(vgg_path)
        if not vgg_path:
            vgg_path = discover_vgg_weights()
            if vgg_path:
                self.logger.log(
                    f"Auto-discovered VGG19 weights: {vgg_path}"
                )
        self.vgg_pretrained = False
        if vgg_path and os.path.exists(vgg_path):
            loaded = _load_vgg_weights(vgg_path)
            # A full 16-conv hub file also serves a truncated trunk
            # (--vgg-convs): keep the convs the module uses, then
            # key/shape-verify against the initialized template.
            loaded = {k: v for k, v in loaded.items() if k in vgg_params}
            vgg_params = _match_tree(vgg_params, loaded)
            self.logger.log(f"Loaded VGG19 weights from {vgg_path}")
            self.vgg_pretrained = True
        elif explicit:
            raise FileNotFoundError(
                f"--vgg-weights file not found: {vgg_path}"
            )
        self.state = replicate(state, self.mesh)
        self.vgg_params = replicate(vgg_params, self.mesh)

    # ----------------------------------------------------- jitted steps

    def _build_steps(self) -> None:
        gen_t, disc_t = self.gen_train, self.disc_train
        gen_e = self.gen_eval
        opt = self.opt
        pixel_loss = self._pixel_loss
        disc_loss_fn, gen_loss_terms = self._disc_gen_losses()
        vgg = self.vgg

        def _gen_apply(params, stats, x, train):
            module = gen_t if train else gen_e
            variables = {"params": params}
            if stats:
                variables["batch_stats"] = stats
            if train:
                out, mut = module.apply(
                    variables, x, train=True, mutable=["batch_stats"]
                )
                return out, mut.get("batch_stats", stats)
            return module.apply(variables, x, train=False), stats

        def _disc_apply(params, stats, x):
            variables = {"params": params}
            if stats:
                variables["batch_stats"] = stats
            out, mut = disc_t.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return out, mut.get("batch_stats", stats)

        def pretrain_core(gen_params, gen_stats, crops_u8, flips):
            """Loss + gradients for one pretrain step (shared by the
            per-leaf and packed-native jits; the optimizer application
            differs between them)."""
            lr_img, hr_img = synthesize_pair(
                crops_u8, flips, upscale_factor=self.upscale
            )

            def loss_fn(gp):
                sr, new_stats = _gen_apply(gp, gen_stats, lr_img, True)
                return pixel_loss(sr, hr_img), new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(gen_params)
            return loss, new_stats, grads

        def pretrain_step(state: GANTrainState, crops_u8, flips):
            loss, new_stats, grads = pretrain_core(
                state.gen_params, state.gen_stats, crops_u8, flips
            )
            new_params, new_opt = _opt_apply(
                state.gen_params, grads, state.psnr_opt_state, opt, BASE_LR
            )
            state = state.replace(
                gen_params=new_params,
                gen_stats=new_stats,
                psnr_opt_state=new_opt,
                step=state.step + 1,
            )
            return state, loss

        def gan_core(
            gen_params, gen_stats, disc_params, disc_stats,
            crops_u8, flips, vgg_params, update_disc,
        ):
            """One adversarial step's graph up to the gradients.

            Shared by the per-leaf and packed-native jits.  The
            discriminator optimizer application happens MID-step (the
            generator update must see the *updated* discriminator, as
            the reference steps disc_optimizer before the gen losses),
            so it is injected as ``update_disc(dgrads) ->
            (new_disc_params, extra)`` — tree Adam for the per-leaf
            path, flat fused Adam for the packed path.
            """
            lr_img, hr_img = synthesize_pair(
                crops_u8, flips, upscale_factor=self.upscale
            )

            # Generator forward ONCE, via vjp: its output feeds the
            # disc update AND (through the saved linearization) the
            # generator update — exactly the reference's graph, where
            # `sr` is computed once per step (srgan/trainer.py:444) and
            # the gen backward runs after the disc optimizer step.  The
            # torch ESRGAN trainer re-runs the generator (:447, :462);
            # with identical params that forward is value-identical.
            # Whether reusing the linearization (vjp) beats recomputing
            # the forward inside the gen grad is model-dependent
            # (residual liveness vs an extra forward) — subclasses pick
            # via `gen_grad_strategy` from measurements.
            use_vjp = self.gen_grad_strategy == "vjp"

            def gen_fwd(gp):
                return _gen_apply(gp, gen_stats, lr_img, True)

            if use_vjp:
                (sr, gen_stats1), gen_vjp = jax.vjp(gen_fwd, gen_params)
            else:
                sr, gen_stats1 = gen_fwd(gen_params)
            sr_sg = jax.lax.stop_gradient(sr)

            def d_loss(dp):
                real, stats1 = _disc_apply(dp, disc_stats, hr_img)
                fake, stats2 = _disc_apply(dp, stats1, sr_sg)
                return disc_loss_fn(real, fake), stats2

            (disc_loss_val, disc_stats1), dgrads = jax.value_and_grad(
                d_loss, has_aux=True
            )(disc_params)
            new_disc_params, disc_extra = update_disc(dgrads)

            hr_sg = jax.lax.stop_gradient(hr_img)

            def head_loss(sr2):
                feat_sr = vgg.apply({"params": vgg_params}, sr2)
                feat_hr = vgg.apply({"params": vgg_params}, hr_sg)
                content = L.l1_loss(feat_sr, feat_hr)
                loss, disc_stats2 = gen_loss_terms(
                    _disc_apply, new_disc_params, disc_stats1,
                    sr2, hr_sg, content,
                )
                return loss, disc_stats2

            if use_vjp:
                (gen_loss_val, disc_stats2), sr_grad = (
                    jax.value_and_grad(head_loss, has_aux=True)(sr)
                )
                (ggrads,) = gen_vjp(
                    (sr_grad, jax.tree.map(jnp.zeros_like, gen_stats1))
                )
                gen_stats2 = gen_stats1
            else:
                def g_loss(gp):
                    sr2, stats2 = _gen_apply(gp, gen_stats1, lr_img, True)
                    loss, dstats = head_loss(sr2)
                    return loss, (stats2, dstats)

                (gen_loss_val, (gen_stats2, disc_stats2)), ggrads = (
                    jax.value_and_grad(g_loss, has_aux=True)(gen_params)
                )
            return (
                disc_loss_val, gen_loss_val, gen_stats2, disc_stats2,
                ggrads, new_disc_params, disc_extra,
            )

        def gan_step(
            state: GANTrainState, crops_u8, flips, gen_lr, disc_lr,
            vgg_params,
        ):
            # vgg_params is an explicit jit argument: closure-capturing
            # the ~20M-param VGG trunk would bake it into the executable
            # as a constant (rule #4; ~300x per-call penalty on TPU).
            def update_disc(dgrads):
                return _opt_apply(
                    state.disc_params, dgrads, state.disc_opt_state,
                    opt, disc_lr,
                )

            (
                disc_loss_val, gen_loss_val, gen_stats2, disc_stats2,
                ggrads, new_disc_params, new_disc_opt,
            ) = gan_core(
                state.gen_params, state.gen_stats, state.disc_params,
                state.disc_stats, crops_u8, flips, vgg_params,
                update_disc,
            )
            new_gen_params, new_gen_opt = _opt_apply(
                state.gen_params, ggrads, state.gen_opt_state, opt, gen_lr
            )
            state = state.replace(
                gen_params=new_gen_params,
                gen_stats=gen_stats2,
                disc_params=new_disc_params,
                disc_stats=disc_stats2,
                gen_opt_state=new_gen_opt,
                disc_opt_state=new_disc_opt,
                step=state.step + 1,
            )
            return state, {
                "disc_loss": disc_loss_val,
                "gen_loss": gen_loss_val,
            }

        def eval_step(gen_params, gen_stats, crops_u8, mask):
            lr_img, _bic, hr_img = synthesize_eval_triple(
                crops_u8, upscale_factor=self.upscale
            )
            sr, _ = _gen_apply(gen_params, gen_stats, lr_img, False)
            mask = mask.astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            # Reference batch PSNR: one log10 over the batch MSE
            # (srgan/trainer.py:296), here masked to the valid samples.
            mse_b = jnp.sum(mse_per_sample(sr, hr_img) * mask) / denom
            psnr_b = 10.0 * jnp.log10(1.0 / jnp.maximum(mse_b, 1e-12))
            ssim_b = jnp.sum(ssim_per_sample(sr, hr_img) * mask) / denom
            per = jax.vmap(pixel_loss)(sr, hr_img)
            loss_b = jnp.sum(per * mask) / denom
            return psnr_b, ssim_b, loss_b

        donate = functools.partial(jax.jit, donate_argnums=(0,))
        self.pretrain_step = donate(pretrain_step)
        self.gan_step = donate(gan_step)
        # Unjitted loss+grad core, exposed for section-level profiling
        # (tools/profile_pretrain.py ablates optimizer/state threading
        # against it); not a training entry point.
        self._pretrain_core = pretrain_core
        self.eval_step = jax.jit(eval_step)
        self.infer = jax.jit(
            lambda params, stats, x: _gen_apply(params, stats, x, False)[0]
        )

        # Multi-step scan programs — the production epoch loops.  K
        # training steps run per jitted call (`lax.scan` over a stacked
        # batch axis), amortizing the ~4.5 ms/call dispatch floor this
        # platform's tunnel imposes (measured: one ESRGAN GAN step's
        # device time is 76.7 ms by in-jit chaining vs 82.5 ms as a
        # per-call loop; for the 11.9 ms SRGAN pretrain step the
        # per-call overhead is ~38%).  scan traces the body ONCE, so
        # compile time stays at single-step cost, unlike an unrolled
        # chain.  The epoch's ragged tail runs through the single-step
        # jits (see data/prefetch.py prefetch_to_device_stacked).
        def pretrain_multi(state, crops_k, flips_k):
            def body(st, batch):
                st, loss = pretrain_step(st, batch[0], batch[1])
                return st, loss

            state, losses = jax.lax.scan(body, state, (crops_k, flips_k))
            return state, losses

        def gan_multi(state, crops_k, flips_k, gen_lr, disc_lr,
                      vgg_params):
            def body(st, batch):
                st, m = gan_step(
                    st, batch[0], batch[1], gen_lr, disc_lr, vgg_params
                )
                return st, (m["disc_loss"], m["gen_loss"])

            if (
                self.GAN_MULTI_UNROLL
                and crops_k.shape[0] <= self.GAN_STEPS_PER_CALL
            ):
                # Unrolled chain: XLA schedules a while-loop (scan)
                # body measurably worse than the same body straightline
                # at large step sizes (round 4, ESRGAN GAN: scan-8
                # 77.57 ms/step, per-call 76.77, unrolled-2 76.21) —
                # trading K-times the compile time (persistent-cached)
                # for the best of both: no scan penalty, amortized
                # dispatch.  Capped at the model's tuned K: an explicit
                # --steps-per-call larger than GAN_STEPS_PER_CALL falls
                # back to lax.scan rather than multiplying the
                # minutes-long GAN first-compile by K.
                dls, gls = [], []
                for i in range(crops_k.shape[0]):
                    state, (dl, gl) = body(
                        state, (crops_k[i], flips_k[i])
                    )
                    dls.append(dl)
                    gls.append(gl)
                return state, {
                    "disc_loss": jnp.stack(dls),
                    "gen_loss": jnp.stack(gls),
                }
            state, (dl, gl) = jax.lax.scan(body, state, (crops_k, flips_k))
            return state, {"disc_loss": dl, "gen_loss": gl}

        self.pretrain_step_multi = donate(pretrain_multi)
        self.gan_step_multi = donate(gan_multi)
        explicit_k = int(getattr(self.args, "steps_per_call", 0) or 0)
        self.steps_per_call = explicit_k or 8
        # GAN-phase K is model-dependent (round 4, measured on v5e):
        # the ESRGAN GAN step runs ~0.8 ms/step FASTER at K=1 than
        # inside the length-8 lax.scan (76.77 vs 77.57 ms wall) — the
        # scan body schedules ~4.6 ms/step worse than the same body
        # straightline, more than the per-call dispatch it saves at
        # this step size.  SRGAN GAN measures parity (44.59 vs 44.70),
        # so it keeps the dispatch amortization.  An explicit
        # --steps-per-call overrides both phases.
        self.gan_steps_per_call = explicit_k or self.GAN_STEPS_PER_CALL

        self._build_packed_steps(
            donate, pretrain_core, gan_core, pretrain_step, gan_step
        )

    def _build_packed_steps(
        self, donate, pretrain_core, gan_core, pretrain_step, gan_step
    ) -> None:
        """Packed-native step variants — a MEASURED NEGATIVE kept
        in-tree (the production loops use the multi-step scan programs
        above; full numbers in docs/benchmarks.md "Call-overhead
        anatomy").

        The design: the state crosses the jit boundary as one flat
        buffer per dtype (per-leaf marshalling of the 3,631-leaf
        ESRGAN tree costs 19.4 ms/call vs 5.5 packed, by donated
        no-op probes), the model math runs on unpacked views, and the
        optimizer runs FLAT — one fused `flat_adam` over each
        contiguous param/moment region, with the output buffer
        assembled from ~10 large segments.

        Why it loses anyway (isolated, order-swapped A/B): per-leaf
        step 82.5 ms, naive unpack->step->repack 89.3, this
        packed-native variant 85.7 — marshalling OVERLAPS device
        compute in a loop, so the boundary change saves nothing on the
        critical path, while the per-leaf slice/ravel conversions the
        flat optimizer needs cost more device time than the tree-Adam
        kernels they replace.  Kept because the equivalence tests pin
        it, it documents the experiment, and StatePacker/flat_adam are
        the starting blocks for any future optimizer-sharding work.

        Falls back to naive pack/unpack wrapping if the state layout
        breaks the region assumptions (everything f32/int32, each
        field's leaves contiguous).
        """
        import math as _math

        pk = StatePacker(self.state)
        self.packer = pk
        self.pack_state = jax.jit(pk.pack)
        self.unpack_state = jax.jit(pk.unpack)
        F32 = jnp.dtype(jnp.float32).name
        I32 = jnp.dtype(jnp.int32).name

        def _naive_fallback():
            def packed_pretrain(bufs, crops_u8, flips):
                st, loss = pretrain_step(pk.unpack(bufs), crops_u8, flips)
                return pk.pack(st), loss

            def packed_gan(bufs, crops_u8, flips, gen_lr, disc_lr,
                           vgg_params):
                st, metrics = gan_step(
                    pk.unpack(bufs), crops_u8, flips, gen_lr, disc_lr,
                    vgg_params,
                )
                return pk.pack(st), metrics

            self.pretrain_step_packed = donate(packed_pretrain)
            self.gan_step_packed = donate(packed_gan)

        try:
            if set(pk.sizes) - {F32, I32}:
                raise ValueError("non-f32/i32 state leaves")

            def _rng(prefix, dt=F32, optional=False):
                try:
                    return pk.range_of(prefix, dt)
                except KeyError:
                    if optional:
                        return (0, 0)
                    raise

            R = {
                "gen_params": _rng(".gen_params"),
                "gen_stats": _rng(".gen_stats", optional=True),
                "disc_params": _rng(".disc_params"),
                "disc_stats": _rng(".disc_stats", optional=True),
                "psnr_mu": _rng(".psnr_opt_state[0].mu"),
                "psnr_nu": _rng(".psnr_opt_state[0].nu"),
                "gen_mu": _rng(".gen_opt_state[0].mu"),
                "gen_nu": _rng(".gen_opt_state[0].nu"),
                "disc_mu": _rng(".disc_opt_state[0].mu"),
                "disc_nu": _rng(".disc_opt_state[0].nu"),
            }
            Ri = {
                "psnr_count": _rng(".psnr_opt_state[0].count", I32),
                "gen_count": _rng(".gen_opt_state[0].count", I32),
                "disc_count": _rng(".disc_opt_state[0].count", I32),
                "step": _rng(".step", I32),
            }
            if sum(s for _o, s in R.values()) != pk.sizes[F32]:
                raise ValueError("f32 regions do not tile the buffer")
            if sum(s for _o, s in Ri.values()) != pk.sizes.get(I32, 0):
                raise ValueError("i32 regions do not tile the buffer")
        except (KeyError, ValueError) as exc:
            self.logger.log(
                f"packed-native steps unavailable ({exc}); "
                f"using naive packed wrappers"
            )
            _naive_fallback()
            return

        def _make_unravel(tree):
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            shapes = [
                (tuple(x.shape), int(_math.prod(x.shape))) for x in leaves
            ]

            def unravel(flat):
                out, off = [], 0
                for shape, size in shapes:
                    out.append(
                        jnp.reshape(
                            jax.lax.slice(flat, (off,), (off + size,)),
                            shape,
                        )
                    )
                    off += size
                return jax.tree_util.tree_unflatten(treedef, out)

            return unravel

        unravel_disc = _make_unravel(self.state.disc_params)

        def _ravel(tree):
            leaves = jax.tree_util.tree_leaves(tree)
            if not leaves:
                return jnp.zeros((0,), jnp.float32)
            flats = [jnp.reshape(x, (-1,)) for x in leaves]
            return flats[0] if len(flats) == 1 else jnp.concatenate(flats)

        def _assemble(total, segments):
            """Concatenate (offset, 1-D segment) pairs into the full
            buffer; trace-time asserts catch any layout drift."""
            segs = sorted(
                (s for s in segments if s[1].shape[0]), key=lambda t: t[0]
            )
            pos = 0
            for off, arr in segs:
                if off != pos:
                    raise AssertionError(
                        f"packed segment at {off}, expected {pos}"
                    )
                pos += arr.shape[0]
            if pos != total:
                raise AssertionError(
                    f"packed segments cover {pos} of {total}"
                )
            return (
                segs[0][1] if len(segs) == 1
                else jnp.concatenate([a for _o, a in segs])
            )

        def packed_pretrain(bufs, crops_u8, flips):
            st = pk.unpack(bufs)
            loss, new_stats, grads = pretrain_core(
                st.gen_params, st.gen_stats, crops_u8, flips
            )
            f = bufs[F32]

            def sl(r):
                return jax.lax.slice(f, (r[0],), (r[0] + r[1],))

            p2, mu2, nu2, c2 = flat_adam(
                sl(R["gen_params"]), _ravel(grads),
                sl(R["psnr_mu"]), sl(R["psnr_nu"]),
                st.psnr_opt_state[0].count, BASE_LR,
            )
            new_f = _assemble(pk.sizes[F32], [
                (R["gen_params"][0], p2),
                (R["gen_stats"][0], _ravel(new_stats)),
                (R["disc_params"][0], sl(R["disc_params"])),
                (R["disc_stats"][0], sl(R["disc_stats"])),
                (R["psnr_mu"][0], mu2),
                (R["psnr_nu"][0], nu2),
                (R["gen_mu"][0], sl(R["gen_mu"])),
                (R["gen_nu"][0], sl(R["gen_nu"])),
                (R["disc_mu"][0], sl(R["disc_mu"])),
                (R["disc_nu"][0], sl(R["disc_nu"])),
            ])
            g = bufs[I32]

            def sli(r):
                return jax.lax.slice(g, (r[0],), (r[0] + r[1],))

            new_i = _assemble(pk.sizes[I32], [
                (Ri["psnr_count"][0], jnp.reshape(c2, (1,))),
                (Ri["gen_count"][0], sli(Ri["gen_count"])),
                (Ri["disc_count"][0], sli(Ri["disc_count"])),
                (Ri["step"][0], jnp.reshape(st.step + 1, (1,))),
            ])
            return {F32: new_f, I32: new_i}, loss

        def packed_gan(bufs, crops_u8, flips, gen_lr, disc_lr,
                       vgg_params):
            st = pk.unpack(bufs)
            f = bufs[F32]

            def sl(r):
                return jax.lax.slice(f, (r[0],), (r[0] + r[1],))

            def update_disc(dgrads):
                dp2, dmu2, dnu2, dc2 = flat_adam(
                    sl(R["disc_params"]), _ravel(dgrads),
                    sl(R["disc_mu"]), sl(R["disc_nu"]),
                    st.disc_opt_state[0].count, disc_lr,
                )
                return unravel_disc(dp2), (dp2, dmu2, dnu2, dc2)

            (
                disc_loss_val, gen_loss_val, gen_stats2, disc_stats2,
                ggrads, _new_disc_params, (dp2, dmu2, dnu2, dc2),
            ) = gan_core(
                st.gen_params, st.gen_stats, st.disc_params,
                st.disc_stats, crops_u8, flips, vgg_params, update_disc,
            )
            gp2, gmu2, gnu2, gc2 = flat_adam(
                sl(R["gen_params"]), _ravel(ggrads),
                sl(R["gen_mu"]), sl(R["gen_nu"]),
                st.gen_opt_state[0].count, gen_lr,
            )
            new_f = _assemble(pk.sizes[F32], [
                (R["gen_params"][0], gp2),
                (R["gen_stats"][0], _ravel(gen_stats2)),
                (R["disc_params"][0], dp2),
                (R["disc_stats"][0], _ravel(disc_stats2)),
                (R["psnr_mu"][0], sl(R["psnr_mu"])),
                (R["psnr_nu"][0], sl(R["psnr_nu"])),
                (R["gen_mu"][0], gmu2),
                (R["gen_nu"][0], gnu2),
                (R["disc_mu"][0], dmu2),
                (R["disc_nu"][0], dnu2),
            ])
            g = bufs[I32]

            def sli(r):
                return jax.lax.slice(g, (r[0],), (r[0] + r[1],))

            new_i = _assemble(pk.sizes[I32], [
                (Ri["psnr_count"][0], sli(Ri["psnr_count"])),
                (Ri["gen_count"][0], jnp.reshape(gc2, (1,))),
                (Ri["disc_count"][0], jnp.reshape(dc2, (1,))),
                (Ri["step"][0], jnp.reshape(st.step + 1, (1,))),
            ])
            return {F32: new_f, I32: new_i}, {
                "disc_loss": disc_loss_val,
                "gen_loss": gen_loss_val,
            }

        self.pretrain_step_packed = donate(packed_pretrain)
        self.gan_step_packed = donate(packed_gan)

    # ------------------------------------------------------- utilities

    def _load_sample_image(self) -> None:
        """Load the fixed progress-sample image if present.

        The reference hard-requires ``media/waterfalls-low-res.png``
        relative to the CWD and crashes otherwise
        (srgan/trainer.py:128-134); we degrade to skipping the render.
        """
        self.sample_image = None
        path = getattr(self.args, "sample_image", None) or SAMPLE_IMAGE_PATH
        # Loaded on EVERY process (multi-process runs share a working
        # directory, the same assumption checkpoint resume makes): the
        # render's jitted forward runs over the global mesh, so all
        # processes must participate in it — only the host-side image
        # I/O is gated to main (the reference likewise runs the forward
        # on all ranks and saves on rank 0, srgan/trainer.py:335).
        if self.save_image and os.path.exists(path):
            arr = image_io.load_image(path).astype(np.float32) / 255.0
            self.sample_image = arr[None]
        if self.save_image and self.main_process:
            os.makedirs("output", exist_ok=True)

    def _generator_state(self) -> dict:
        # Checkpoints are canonically UNROLLED (block{i} subtrees):
        # fast-compile (nn.scan) runs unstack their params on save so
        # their checkpoints stay interchangeable with production runs
        # and the reference .pth converters (models/scan_compat.py).
        from torchsr_tpu.models.scan_compat import unroll_blocks

        return {
            "params": unroll_blocks(
                jax.device_get(self.state.gen_params)
            ),
            "batch_stats": unroll_blocks(
                jax.device_get(self.state.gen_stats)
            ),
        }

    def _full_state(self) -> dict:
        host = jax.device_get(self.state)
        return {
            "disc_params": host.disc_params,
            "disc_stats": host.disc_stats,
            "psnr_opt_state": host.psnr_opt_state,
            "gen_opt_state": host.gen_opt_state,
            "disc_opt_state": host.disc_opt_state,
            "step": host.step,
            "best_psnr": float(self.best_psnr),
        }

    def _restore(self, checkpoint: dict, phase: str) -> int:
        """Install checkpoint contents into the live state; return epoch.

        ``phase`` is the CURRENT training phase: ``best_psnr`` (and the
        rest of the extras) are only adopted when the checkpoint came
        from the same phase — initializing the GAN phase from PSNR
        weights must NOT inherit the pretrain's best PSNR, or the GAN
        phase never writes its ``-best`` checkpoint (each phase tracks
        its own record, reference srgan/trainer.py:478).
        """
        from torchsr_tpu.models.scan_compat import (
            is_scan_layout,
            stack_blocks,
        )

        state_dict = checkpoint["state"]
        new_params = state_dict.get("params", state_dict)
        new_stats = state_dict.get("batch_stats", {})
        host_gen = jax.device_get(self.state.gen_params)
        if is_scan_layout(host_gen) and not is_scan_layout(new_params):
            # live model is the fast-compile (nn.scan) layout; stack the
            # canonical unrolled checkpoint into it
            new_params = stack_blocks(new_params)
            new_stats = stack_blocks(new_stats) if new_stats else new_stats
        updates = {
            "gen_params": _match_tree(host_gen, new_params),
        }
        if new_stats:
            updates["gen_stats"] = _match_tree(
                jax.device_get(self.state.gen_stats), new_stats
            )
        extra = checkpoint.get("extra")
        # checkpoint phase is "{model}-{phase}"; compare the suffix
        # ("gan" is a substring of "srgan", so `in` would always match)
        ckpt_phase = str(checkpoint.get("phase", "")).split("-")[-1]
        same_phase = ckpt_phase == phase
        if extra and same_phase:
            # Lossless resume only within the same training phase; a
            # cross-phase restore (GAN init from PSNR weights) is
            # weights-only, like the reference.
            for key in (
                "disc_params", "disc_stats", "psnr_opt_state",
                "gen_opt_state", "disc_opt_state", "step",
            ):
                if key in extra:
                    try:
                        updates[key] = _match_tree(
                            jax.device_get(getattr(self.state, key)),
                            extra[key],
                        )
                    except Exception:
                        # Optimizer moments nest the generator's param
                        # layout; a checkpoint written by the other
                        # --fast-compile mode cannot restore them.
                        # Degrade to a weights-only resume for this key
                        # (the reference loses ALL extras on every
                        # resume, srgan/trainer.py:254-258).
                        self.logger.log(
                            f"resume: skipping {key} "
                            f"(incompatible layout)"
                        )
            if "best_psnr" in extra:
                self.best_psnr = float(extra["best_psnr"])
        host_state = jax.device_get(self.state).replace(**updates)
        self.state = replicate(host_state, self.mesh)
        return int(checkpoint.get("epoch", 1))

    def _save(
        self, epoch: int, phase: str, kind: str, sync: bool = False
    ) -> None:
        """Write (or enqueue) the ``{phase}-{kind}`` checkpoint.

        Async path (default): the on-device snapshot is a jitted
        program over the global mesh, so ALL processes take it (the
        save schedule is driven by replicated values and is therefore
        identical across processes); only the main process enqueues the
        host write.  ``sync=True`` forces the blocking path — used for
        preemption saves, where the signal may reach processes at
        different step boundaries and a collective snapshot could
        deadlock.
        """
        path = f"{phase}-{kind}.ckpt"
        if self.async_saves and not sync:
            gen_snap = device_snapshot({
                "params": self.state.gen_params,
                "batch_stats": self.state.gen_stats,
            })
            extra_snap = device_snapshot({
                "disc_params": self.state.disc_params,
                "disc_stats": self.state.disc_stats,
                "psnr_opt_state": self.state.psnr_opt_state,
                "gen_opt_state": self.state.gen_opt_state,
                "disc_opt_state": self.state.disc_opt_state,
                "step": self.state.step,
                "best_psnr": float(self.best_psnr),
            })
            if self.ckpt_writer is None:
                return  # snapshot participation only (non-main process)
            from torchsr_tpu.models.scan_compat import unroll_blocks

            self.ckpt_writer.enqueue(
                path, epoch, phase, gen_snap, extra_snap,
                host_transform=lambda gs: {
                    "params": unroll_blocks(gs["params"]),
                    "batch_stats": unroll_blocks(gs["batch_stats"]),
                },
            )
            return
        if not self.main_process:
            return
        save_checkpoint(
            path,
            epoch,
            phase,
            self._generator_state(),
            extra=self._full_state(),
        )

    def _wait_saves(self, barrier: bool = False) -> None:
        """Drain pending async checkpoint writes (no-op on sync path).

        ``barrier=True`` additionally synchronizes all processes AFTER
        the drain — required wherever a checkpoint READ follows (phase
        boundaries): only the main process owns a writer, so without a
        barrier a non-main process races ahead, finds the file missing,
        and skips ``_restore`` while the main process enters its
        collective ``replicate`` — a control-flow divergence that
        deadlocks the job (observed in the 2-process full-train test).
        Never pass ``barrier=True`` on preemption/exit paths, where
        processes may arrive asymmetrically.
        """
        if self.ckpt_writer is not None:
            self.ckpt_writer.wait(log=self.logger.log)
        if barrier and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("torchsr-ckpt-drain")

    def _put(self, *arrays):
        return put_batch(tuple(arrays), self.mesh)

    def _check_preemption(self, epoch: int, phase: str) -> None:
        """Between jitted step calls: if a termination signal arrived,
        write the full ``-latest`` checkpoint for the current phase and
        raise ``TrainingPreempted`` (caught in ``train``).  The saved
        epoch is the one being interrupted, so the resume-at-epoch rule
        re-runs it from its start (reference srgan/trainer.py:367)."""
        if self._preemption is None or not self._preemption.requested:
            return
        # Multi-process: SIGTERM may reach processes at different step
        # boundaries, so the preemption save must not run the collective
        # snapshot — force the synchronous (process-local) write path.
        self._save(epoch, phase, "latest", sync=jax.process_count() > 1)
        self._wait_saves()  # the file must exist before the clean exit
        self.logger.log(
            f"Preemption signal received: saved {phase}-latest.ckpt "
            f"at epoch {epoch}; exiting cleanly"
        )
        raise TrainingPreempted(phase)

    # ------------------------------------------------------------ eval

    def _test(self, epoch: int, phase: str, step: int) -> None:
        """Validation pass: PSNR/SSIM/val-loss + best/latest checkpoints.

        Metric-key and checkpoint-name contract identical to the
        reference ``_test`` (srgan/trainer.py:260-343), with ``SSIM``
        added.
        """
        self.logger.log(f"Testing results after epoch {epoch}")
        # Accumulate on device; one host sync at the end of the pass.
        psnr_total, ssim_total, loss_total = 0.0, 0.0, 0.0
        batches = 0
        start_time = time.time()
        gen_params, gen_stats = self.state.gen_params, self.state.gen_stats
        bs = self.test_loader.batch_size
        total_valid = 0

        def host_iter():
            nonlocal total_valid
            for c, v in self.test_loader:
                total_valid += int(v)
                yield c, (np.arange(bs) < v).astype(np.float32)

        for crops, mask in tqdm(
            prefetch_to_device(host_iter(), self.mesh),
            total=len(self.test_loader),
            disable=not self.main_process,
        ):
            p, s, l = self.eval_step(gen_params, gen_stats, crops, mask)
            psnr_total = psnr_total + p
            ssim_total = ssim_total + s
            loss_total = loss_total + l
            batches += 1
        psnr_total = float(psnr_total)
        ssim_total = float(ssim_total)
        loss_total = float(loss_total)
        time_taken = max(time.time() - start_time, 1e-9)
        # Actual (unpadded) samples evaluated; the reference counts
        # batches*batch_size even when the last batch is short.
        throughput = total_valid * self.world_size / time_taken
        psnr_avg = psnr_total / max(batches, 1)
        ssim_avg = ssim_total / max(batches, 1)
        loss_avg = loss_total / max(batches, 1)

        self.logger.log(
            f"PSNR: {round(psnr_avg, 3)}, SSIM: {round(ssim_avg, 4)}, "
            f"Throughput: {round(throughput, 3)} images/sec"
        )
        short_phase = "".join(phase.split("-")[1:])
        self.logger.log_wandb(
            {
                f"{short_phase}/PSNR": psnr_avg,
                f"{short_phase}/SSIM": ssim_avg,
                f"{short_phase}/val-loss": loss_avg,
                f"{short_phase}/throughput/test": throughput,
                f"{short_phase}/epoch": epoch,
            },
            step=step,
        )

        if psnr_avg > self.best_psnr:
            self.best_psnr = psnr_avg
            self._save(epoch, phase, "best")
        self._save(epoch, phase, "latest")
        self._render_sample(epoch)

    def _render_sample(self, epoch: int) -> None:
        if self.sample_image is None:
            return
        # The forward is a global-mesh program: all processes run it
        # (replicated compute, no collectives); host I/O is main-only.
        sr = self.infer(
            self.state.gen_params, self.state.gen_stats, self.sample_image
        )
        if not self.main_process:
            return
        # One fetch of the (replicated) output; everything below is
        # host/local-device work so a non-main process never has to
        # participate in it.
        sr_host = np.asarray(sr)
        image_io.save_image(
            sr_host[0], os.path.join("output", f"SR_epoch{epoch}.png")
        )
        if self.logger.wandb_active:
            # The reference logs a quarter-size bicubic copy to WandB
            # (srgan/trainer.py:337-343).
            from torchsr_tpu.ops.resize import bicubic_resize

            h, w = sr_host.shape[1] // 4, sr_host.shape[2] // 4
            quarter = bicubic_resize(
                jnp.asarray(np.clip(sr_host, 0.0, 1.0)), (h, w),
                quantize=True,
            )
            self.logger.log_image(
                f"images/epoch{epoch}",
                image_io.to_uint8(np.asarray(quarter[0])),
            )

    # --------------------------------------------------------- phases

    def _stacked_epoch_loop(
        self,
        *,
        epoch: int,
        shuffle_epoch: int,
        phase: str,
        epoch_offset: int,
        run_call,
        wandb_payload,
        prev_step: int,
    ) -> int:
        """Shared K-steps-per-call epoch scaffolding for both phases.

        Drives the epoch's batches through ``run_call(kind, payload) ->
        (k, losses)`` — which applies the jitted multi/single step
        program to ``self.state`` and returns the number of fused steps
        plus the per-step loss scalar/vector — handling the bookkeeping
        both phases share: profiler/progress-bar updates, the
        preemption poll between jitted calls, the reference's global
        sample-step arithmetic (srgan/trainer.py:390-391), and the
        per-step wandb expansion of a multi-step call's loss vector
        (``wandb_payload(loss_value) -> dict`` supplies the phase's
        metric keys).  Returns the final global step (``prev_step`` if
        the epoch had no batches)."""
        pbar = tqdm(
            total=len(self.train_loader), disable=not self.main_process,
        )
        done = 0
        step = prev_step
        scale = self.batch_size * self.world_size
        steps_per_call = (
            self.gan_steps_per_call if phase.endswith("-gan")
            else self.steps_per_call
        )
        for kind, payload in prefetch_to_device_stacked(
            self.train_loader.epoch(shuffle_epoch), self.mesh,
            steps_per_call,
        ):
            k, losses = run_call(kind, payload)
            self.profiler.step(k)
            done += k
            pbar.update(k)
            self._check_preemption(epoch, phase)
            step = (done - 1) * scale + epoch_offset
            if self.logger.wandb_active:
                # The device fetch syncs — only pay it when wandb
                # actually consumes the values, and fetch a multi-step
                # call's K losses in ONE transfer (per-element float()
                # would issue K round trips through the runtime).
                per_step = (
                    np.asarray(jax.device_get(losses)).tolist()
                    if k > 1 else [float(losses)]
                )
                for j, lv in enumerate(per_step):
                    self.logger.log_wandb(
                        wandb_payload(lv),
                        step=(done - k + j) * scale + epoch_offset,
                    )
        pbar.close()
        return step

    def _pretrain(self) -> None:
        self.logger.log("=" * 80)
        self.logger.log("Starting pre-training")
        # resume may read files still being written (barrier: every
        # process must see the drained files before the restore branch)
        self._wait_saves(barrier=True)
        epoch = 1
        # An explicit --psnr-checkpoint replaces the default path
        # entirely (reference srgan/trainer.py:356-360), it is not a
        # fallback chain.
        if self.psnr_checkpoint:
            path = find_checkpoint(self.psnr_checkpoint)
        else:
            path = find_checkpoint(f"{self.model_name}-psnr-latest.ckpt")
        checkpoint = load_checkpoint(path, self.model_name)
        if checkpoint:
            epoch = self._restore(checkpoint, "psnr")
            self.logger.log(f"Resuming pre-training from epoch {epoch}")

        step = 0
        for epoch in range(epoch, self.pre_epochs + 1):
            self.logger.log("-" * 80)
            self.logger.log(
                f"Starting epoch {epoch} out of {self.pre_epochs}"
            )
            start_time = time.time()

            # K steps per jitted call (lax.scan over the stacked batch
            # axis); the ragged tail goes through the single-step jit.
            def run_call(kind, payload):
                if kind == "multi":
                    crops_k, flips_k = payload
                    self.state, losses = self.pretrain_step_multi(
                        self.state, crops_k, flips_k
                    )
                    return int(crops_k.shape[0]), losses
                crops_dev, flips_dev = payload
                self.state, loss = self.pretrain_step(
                    self.state, crops_dev, flips_dev
                )
                return 1, loss

            step = self._stacked_epoch_loop(
                epoch=epoch,
                shuffle_epoch=epoch - 1,
                phase=f"{self.model_name}-psnr",
                epoch_offset=(epoch - 1) * self.train_len,
                run_call=run_call,
                wandb_payload=lambda lv: {
                    "psnr/train-loss": lv,
                    "psnr/epoch": epoch,
                },
                prev_step=step,
            )
            jax.block_until_ready(self.state.gen_params)
            time_taken = max(time.time() - start_time, 1e-9)
            throughput = (
                len(self.train_loader) * self.batch_size * self.world_size
                / time_taken
            )
            self.logger.log(
                f"Throughput: {round(throughput, 3)} images/sec"
            )
            self.logger.log_wandb(
                {"psnr/throughput/train": throughput, "psnr/epoch": epoch},
                step=step,
            )
            self._test(epoch, f"{self.model_name}-psnr", step)
        # The GAN phase reads psnr-latest from disk; the barrier keeps
        # non-writer processes from reading before the file lands.
        self._wait_saves(barrier=True)

    def _warn_if_random_vgg(self) -> None:
        """Loud GAN-phase-start warning when the perceptual loss has no
        pretrained features.  The reference always trains against
        pretrained VGG19 (its image pre-bakes vgg19-dcbb9e9d.pth,
        reference Dockerfile:11, loss.py:28-34); random features are a
        fundamentally different loss — make that impossible to miss."""
        if not getattr(self, "vgg_pretrained", False):
            self.logger.log(
                "WARNING: no pretrained VGG19 weights found — the "
                "perceptual loss is using RANDOM VGG features. "
                "Results will NOT match the reference recipe. "
                "Fetch weights with `python tools/fetch_vgg19.py` or "
                "pass --vgg-weights / set TORCHSR_VGG_WEIGHTS."
            )

    def _gan_train(self) -> None:
        self.logger.log("=" * 80)
        self.logger.log("Starting training loop")
        self._warn_if_random_vgg()
        self._wait_saves(barrier=True)  # the resume branch reads files
        epoch = 1
        self.best_psnr = -1.0

        # Resume priority: explicit GAN ckpt (exclusive when given) >
        # gan-latest > psnr-latest (reference srgan/trainer.py:482-498).
        if self.gan_checkpoint:
            path = find_checkpoint(self.gan_checkpoint)
        else:
            path = find_checkpoint(f"{self.model_name}-gan-latest.ckpt")
        checkpoint = load_checkpoint(path, self.model_name)
        if checkpoint:
            epoch = self._restore(checkpoint, "gan")
            self.logger.log(f"Resuming GAN training from epoch {epoch}")
        else:
            checkpoint = load_checkpoint(
                find_checkpoint(f"{self.model_name}-psnr-latest.ckpt"),
                self.model_name,
            )
            if checkpoint:
                # current phase is "gan": takes the PSNR weights but not
                # the pretrain phase's best-PSNR record or step counters
                self._restore(checkpoint, "gan")
                self.logger.log("Initialized GAN phase from PSNR weights")

        step = 0
        for epoch in range(epoch, self.epochs + 1):
            self.logger.log("-" * 80)
            self.logger.log(f"Starting epoch {epoch} out of {self.epochs}")
            gen_lr = step_lr_schedule(BASE_LR, epoch, self.epochs)
            disc_lr = step_lr_schedule(BASE_LR, epoch, self.epochs)
            start_time = time.time()

            # K steps per jitted call; ragged tail on the single-step
            # jit (see _pretrain).
            def run_call(kind, payload, gen_lr=gen_lr, disc_lr=disc_lr):
                if kind == "multi":
                    crops_k, flips_k = payload
                    self.state, metrics = self.gan_step_multi(
                        self.state, crops_k, flips_k, gen_lr, disc_lr,
                        self.vgg_params,
                    )
                    return int(crops_k.shape[0]), metrics["gen_loss"]
                crops_dev, flips_dev = payload
                self.state, metrics = self.gan_step(
                    self.state, crops_dev, flips_dev, gen_lr,
                    disc_lr, self.vgg_params,
                )
                return 1, metrics["gen_loss"]

            step = self._stacked_epoch_loop(
                epoch=epoch,
                shuffle_epoch=self.pre_epochs + epoch - 1,
                phase=f"{self.model_name}-gan",
                epoch_offset=(
                    (self.pre_epochs + epoch - 1) * self.train_len
                ),
                run_call=run_call,
                wandb_payload=lambda lv: {
                    "gan/disc-lr": disc_lr,
                    "gan/gen-lr": gen_lr,
                    "gan/train-loss": lv,
                },
                prev_step=step,
            )
            jax.block_until_ready(self.state.gen_params)
            time_taken = max(time.time() - start_time, 1e-9)
            throughput = (
                len(self.train_loader) * self.batch_size * self.world_size
                / time_taken
            )
            self.logger.log(
                f"Throughput: {round(throughput, 3)} images/sec"
            )
            self.logger.log_wandb(
                {"gan/throughput/train": throughput, "gan/epoch": epoch},
                step=step,
            )
            self._test(epoch, f"{self.model_name}-gan", step)
        self._wait_saves()

    def train(self) -> None:
        """Pretrain then GAN-train (reference srgan/trainer.py:533-543).

        With ``preempt_save`` (default on; ``--no-preempt-save``
        disables), SIGTERM triggers a full ``-latest`` checkpoint at
        the next step boundary and a clean return — see
        utils/preemption.py for the scheduler/multi-process semantics.
        """
        if self.preempt_save:
            self._preemption = PreemptionGuard().install()
        try:
            self._pretrain()
            self._gan_train()
        except TrainingPreempted:
            pass  # checkpoint already written; exit cleanly
        finally:
            self._wait_saves()
            if self._preemption is not None:
                self._preemption.uninstall()
                self._preemption = None
            self.profiler.stop()
            self.logger.finish()


def discover_vgg_weights() -> str | None:
    """Locate pretrained VGG19 weights without an explicit flag.

    Search order: ``TORCHSR_VGG_WEIGHTS`` env var, the fetch script's
    cache (``~/.cache/torchsr_tpu/``), then torchvision's hub cache
    (``$TORCH_HOME/hub/checkpoints`` or ``~/.cache/torch/hub/
    checkpoints``) — the reference Docker image pre-bakes
    ``vgg19-dcbb9e9d.pth`` into exactly that hub cache
    (reference Dockerfile:11)."""
    env = os.environ.get("TORCHSR_VGG_WEIGHTS")
    if env:
        if not os.path.exists(env):
            # As explicit as --vgg-weights: a broken path must not
            # silently degrade training to random VGG features.
            raise FileNotFoundError(
                f"TORCHSR_VGG_WEIGHTS points at a missing file: {env}"
            )
        return env
    home = os.path.expanduser("~")
    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(home, ".cache", "torch")
    )
    candidates = [
        os.path.join(home, ".cache", "torchsr_tpu", "vgg19.ckpt"),
        os.path.join(
            home, ".cache", "torchsr_tpu", "vgg19-dcbb9e9d.pth"
        ),
        os.path.join(
            torch_home, "hub", "checkpoints", "vgg19-dcbb9e9d.pth"
        ),
    ]
    for path in candidates:
        if os.path.exists(path):
            return path
    return None


def _load_vgg_weights(path: str) -> dict:
    """Load VGG19 params from a torch .pth or a converted .ckpt file."""
    if path.endswith((".pth", ".pt")):
        from torchsr_tpu.models import torch_compat

        raw = torch_compat.load_torch_checkpoint(path)
        sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        if not any(str(k).startswith("features.") for k in sd):
            sd = {f"features.{k}": v for k, v in sd.items()}
        return torch_compat.convert_vgg19(sd)["params"]
    from flax import serialization

    with open(path, "rb") as fh:
        variables = serialization.msgpack_restore(fh.read())
    return variables.get("params", variables)


def _extra_keys(template, loaded, prefix=""):
    """Paths present in ``loaded`` that ``template`` has no slot for."""
    if not isinstance(loaded, dict) or not isinstance(template, dict):
        return []
    tpl = {str(k): v for k, v in template.items()}
    out = []
    for key, val in loaded.items():
        if str(key) not in tpl:
            out.append(f"{prefix}{key}")
        else:
            out.extend(_extra_keys(tpl[str(key)], val, f"{prefix}{key}/"))
    return out


def _match_tree(template, loaded, allow_extra=False):
    """Key-aware restoration of a checkpoint tree onto a template pytree.

    Delegates the structural matching to flax ``from_state_dict`` —
    dict leaves are matched BY KEY (missing keys raise with the
    offending path), never by flattened position, so two same-leaf-count
    architectures or a reordered dict can't silently transpose weights.
    ``from_state_dict`` silently DROPS keys the template lacks, which
    would make an architecture mismatch (a 4x checkpoint resumed with
    ``--scale 2``, a 16-block checkpoint with ``--gen-blocks 1``) a
    silent partial restore — so extra keys raise here unless
    ``allow_extra`` (the VGG loss deliberately truncates its template
    with ``--vgg-convs``).  Leaves are then cast to the template's
    dtypes; a size-incompatible leaf raises instead of reshaping
    garbage into place.
    """
    from flax import serialization

    if not allow_extra:
        extra = _extra_keys(
            serialization.to_state_dict(template),
            serialization.to_state_dict(loaded),
        )
        if extra:
            shown = ", ".join(extra[:4]) + ("..." if len(extra) > 4 else "")
            raise ValueError(
                f"checkpoint contains entries the model has no parameters "
                f"for ({shown}) — architecture mismatch: check that "
                f"--scale and --gen-blocks match the checkpoint"
            )

    restored = serialization.from_state_dict(template, loaded)

    def cast(t, l):
        t = np.asarray(t)
        arr = np.asarray(l)
        if arr.shape != t.shape:
            if arr.size != t.size:
                raise ValueError(
                    f"checkpoint leaf shape {arr.shape} is incompatible "
                    f"with the expected {t.shape}"
                )
            arr = arr.reshape(t.shape)
        return arr.astype(t.dtype)

    return jax.tree.map(cast, template, restored)


class SRGANTrainer(GANTrainer):
    """SRGAN recipe: MSE pretrain; BCE GAN; VGG + 0.001*adv generator."""

    model_name = "srgan"

    def _build_models(self, dtype) -> None:
        blocks = getattr(self.args, "num_residual", None) or 16
        vgg_convs = getattr(self.args, "vgg_convs", None)
        scan = bool(getattr(self.args, "fast_compile", False))
        self.gen_train = SRGANGenerator(
            num_residual=blocks, dtype=dtype, scan_blocks=scan,
            scale_factor=self.upscale,
        )
        self.gen_eval = SRGANGenerator(
            num_residual=blocks, scan_blocks=scan,
            scale_factor=self.upscale,
        )
        self.disc_train = SRGANDiscriminator(
            image_size=self.crop_size, dtype=dtype
        )
        self.vgg = VGG19Features(dtype=dtype, max_convs=vgg_convs)

    def _pixel_loss(self, sr, hr):
        return L.mse_loss(sr, hr)

    def _disc_gen_losses(self):
        def disc_loss(real, fake):
            ones = jnp.ones_like(real)
            zeros = jnp.zeros_like(fake)
            return L.bce_loss(real, ones) + L.bce_loss(fake, zeros)

        def gen_terms(disc_apply, disc_params, disc_stats, sr, hr, content):
            # gen loss = content + 0.001 * BCE(D(sr), 1)
            # (reference srgan/trainer.py:455-457)
            del hr
            out, new_stats = disc_apply(disc_params, disc_stats, sr)
            adv = L.bce_loss(out, jnp.ones_like(out))
            return content + 0.001 * adv, new_stats

        return disc_loss, gen_terms


class ESRGANTrainer(GANTrainer):
    """ESRGAN recipe: L1 pretrain; relativistic-average GAN."""

    model_name = "esrgan"
    # Unrolled K=2 measured fastest for this step (76.21 ms/step vs
    # per-call K=1 76.77 and length-8 scan 77.57; _build_steps
    # comment): the scan body schedules ~4.6 ms/step worse than
    # straightline, and at 76 ms/step the dispatch tax K amortizes is
    # mostly overlapped anyway — K=2 keeps the unrolled program's
    # compile time (~2.5 min fresh, persistent-cached) bounded.
    GAN_STEPS_PER_CALL = 2
    GAN_MULTI_UNROLL = True

    def _build_models(self, dtype) -> None:
        blocks = getattr(self.args, "num_residual", None) or 23
        vgg_convs = getattr(self.args, "vgg_convs", None)
        # On multi-device meshes the fused Pallas RDB path must run
        # under shard_map over the batch axis — XLA's partitioner would
        # otherwise all-gather around the custom call (rdb.py docstring).
        mesh = self.mesh if self.mesh.devices.size > 1 else None
        fused = getattr(self.args, "fused_rdb", None)
        interp = bool(getattr(self.args, "pallas_interpret", False))
        scan = bool(getattr(self.args, "fast_compile", False))
        self.gen_train = ESRGANGenerator(
            num_rrdb_blocks=blocks, dtype=dtype, mesh=mesh,
            fused_rdb=fused, pallas_interpret=interp, scan_blocks=scan,
            scale_factor=self.upscale,
        )
        self.gen_eval = ESRGANGenerator(
            num_rrdb_blocks=blocks, mesh=mesh,
            fused_rdb=fused, pallas_interpret=interp, scan_blocks=scan,
            scale_factor=self.upscale,
        )
        self.disc_train = ESRGANDiscriminator(
            image_size=self.crop_size, dtype=dtype
        )
        self.vgg = VGG19Features(dtype=dtype, max_convs=vgg_convs)

    def _pixel_loss(self, sr, hr):
        return L.l1_loss(sr, hr)

    def _disc_gen_losses(self):
        def disc_loss(real, fake):
            # [BCEwL(D(hr)-mean D(sr), 1) + BCEwL(D(sr)-mean D(hr), 0)]/2
            # (reference esrgan/trainer.py:446-453)
            ones = jnp.ones_like(real)
            zeros = jnp.zeros_like(fake)
            loss_real = L.bce_with_logits_loss(
                real - jnp.mean(fake), ones
            )
            loss_fake = L.bce_with_logits_loss(
                fake - jnp.mean(real), zeros
            )
            return (loss_real + loss_fake) / 2.0

        def gen_terms(disc_apply, disc_params, disc_stats, sr, hr, content):
            # 0.01*L1 + 1*content + 0.005*BCEwL(D(sr)-mean D(hr), 1)
            # (reference esrgan/trainer.py:461-469)
            real, stats1 = disc_apply(disc_params, disc_stats, hr)
            fake, stats2 = disc_apply(disc_params, stats1, sr)
            pixel = L.l1_loss(sr, hr)
            adv = L.bce_with_logits_loss(
                fake - jnp.mean(real), jnp.ones_like(fake)
            )
            return 0.01 * pixel + content + 0.005 * adv, stats2

        return disc_loss, gen_terms
