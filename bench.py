"""Headline benchmark: SRGAN training throughput (crops/sec/chip).

Run by the driver on real TPU hardware.  The LAST line printed is the
headline JSON record ``{"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}``; earlier JSON lines record the ESRGAN full GAN step
(the reference's *default* training configuration, constants.py
MODEL='ESRGAN'), the SRGAN full GAN step, and tiled 1080p->4K inference
throughput for BOTH models.  All five metrics are gated against
regression floors by tools/bench_regression.py.

Configuration: SRGAN, 96x96 HR crops (reference
models.py CROP_SIZE['srgan']=96), batch 128, bf16 mixed precision,
measuring the jitted pretrain train step (generator fwd+bwd + Adam)
*including* the on-device LR/HR pair synthesis, fed from host-RAM uint8
crops — i.e. the per-chip steady-state training throughput of the
framework.  Batch 128 is where a v5e chip saturates (measured sweep:
2.3k/7.1k/7.1k/7.0k crops/s at batch 64/128/256/512); the reference's
default batch 64 under-fills the chip.

``vs_baseline``: the reference publishes no quantitative numbers
(BASELINE.md), so the denominator is an estimated V100 throughput for
this exact workload: SRGAN 96px-crop training on a V100 with AMP and a
saturated input pipeline is ~500 crops/sec/GPU in published SRGAN
benchmarks/community training logs.  The BASELINE.md north-star target
is >=10x that (>=5000 crops/sec/chip on v5e).
"""

from __future__ import annotations

import json
import sys
import time
from argparse import Namespace

V100_BASELINE_CROPS_PER_SEC = 500.0
# ESRGAN RRDB training on a V100 with AMP runs ~0.3-0.5 s/iter at batch
# 16 with 128px crops in published BasicSR/community logs => ~32-53
# crops/sec; 40 is the midpoint estimate (the reference itself publishes
# nothing, BASELINE.md).
V100_ESRGAN_GAN_CROPS_PER_SEC = 40.0
# SRGAN full adversarial step on a V100: the GAN step costs ~3x the
# pretrain step (3 discriminator forwards + VGG19 forwards on top of the
# generator fwd+bwd, reference srgan/trainer.py:416-469), so ~150
# crops/sec from the 500 crops/sec pretrain estimate.
V100_SRGAN_GAN_CROPS_PER_SEC = 150.0
# 4x SRGAN inference 1080p->4K on a V100 with fp16: the generator costs
# ~1.2 MFLOP/LR-pixel; at the ~15-25 TFLOP/s a conv stack sustains,
# ~0.15 s/frame => ~20 MP/s of 4K output.  (The reference publishes no
# inference numbers and does a monolithic whole-image forward,
# test.py:62.)
V100_SRGAN_INFER_OUT_MP_PER_SEC = 20.0

BATCH = 128
CROP = 96
WARMUP_STEPS = 5
MEASURE_STEPS = 60

# Round-5 re-sweep under the one-pass-BN + unrolled-K2 step
# (tools/sweep_esrgan_batch.py, order-swapped pass1/pass2):
# b32 409.8/409.4, b48 419.2/416.9, b64 422.0/423.7 crops/s — batch 64
# (also the reference's default BATCH_SIZE) is the measured optimum.
ESRGAN_BATCH = 64
ESRGAN_CROP = 128
ESRGAN_STEPS = 16


def _stacked_device_batches(trainer, tl, k, n_stacks=2):
    """Distinct (k, batch, ...) device batch stacks for the multi-step
    scan programs (cycled during timing so successive calls see
    different data)."""
    import numpy as np

    from torchsr_tpu.parallel.mesh import put_stacked_batch

    host = [tuple(b) for b in tl.epoch(0)]
    stacks = []
    for s in range(n_stacks):
        group = [host[(s * k + i) % len(host)] for i in range(k)]
        stacked = tuple(
            np.stack([g[j] for g in group]) for j in range(len(group[0]))
        )
        stacks.append(put_stacked_batch(stacked, trainer.mesh))
    return stacks


def bench_esrgan_gan() -> None:
    """ESRGAN full adversarial step (the reference's default training
    mode): single fused-Pallas-RDB generator forward with vjp-reused
    gradients, discriminator update, VGG19-perceptual generator update,
    three Adam states.  Chained steps ending in a scalar readback."""
    import time
    from argparse import Namespace

    import jax.numpy as jnp

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.trainer import ESRGANTrainer

    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    args = Namespace(
        batch_size=ESRGAN_BATCH, disable_amp=False, epochs=1,
        pretrain_epochs=1, gan_checkpoint=None, psnr_checkpoint=None,
        seed=0, skip_image_save=True, model="esrgan",
    )
    tl = SyntheticTrainLoader(ESRGAN_BATCH, ESRGAN_CROP, n_batches=2)
    el = SyntheticEvalLoader(ESRGAN_BATCH, ESRGAN_CROP, n_batches=1)
    trainer = ESRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, mesh, ctx
    )
    # The production GAN-phase epoch-loop path: ESRGAN defaults to
    # an UNROLLED K=2 multi program (GAN_STEPS_PER_CALL=2 +
    # GAN_MULTI_UNROLL — the length-8 scan body schedules ~4.6
    # ms/step worse than the same body straightline; round 4), SRGAN
    # to the K=8 scan.  The k==1 branch below only triggers with an
    # explicit --steps-per-call 1.
    k = trainer.gan_steps_per_call
    if k > 1:
        stacks = _stacked_device_batches(trainer, tl, k)
    else:
        stacks = [trainer._put(c, f) for c, f in tl.epoch(0)]

    def one_call(state, crops, flips):
        if k > 1:
            state, m = trainer.gan_step_multi(
                state, crops, flips, 1e-4, 1e-4, trainer.vgg_params
            )
            return state, m["gen_loss"][-1]
        state, m = trainer.gan_step(
            state, crops, flips, 1e-4, 1e-4, trainer.vgg_params
        )
        return state, m["gen_loss"]

    packed_state = trainer.state
    crops_k, flips_k = stacks[0]
    packed_state, gl = one_call(packed_state, crops_k, flips_k)
    float(gl)  # warmup completion readback

    # Two measured phases; keep the second.  The FIRST timing loop in a
    # process reads several-fold slow on this runtime even after
    # readback-terminated warmup (see CLAUDE.md benching rules).
    calls = max(ESRGAN_STEPS // k, 1)
    for _phase in range(2):
        start = time.perf_counter()
        for i in range(calls):
            crops_k, flips_k = stacks[i % len(stacks)]
            packed_state, gl = one_call(packed_state, crops_k, flips_k)
        float(gl)  # chain completion readback
        elapsed = time.perf_counter() - start
    steps_run = calls * k

    n_chips = len(mesh.devices.ravel())
    crops_per_sec = ESRGAN_BATCH * steps_run / elapsed / n_chips
    print(json.dumps({
        "metric": "esrgan_gan_step_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": (
            f"crops/sec/chip (ESRGAN full GAN step, 128x128 HR, "
            f"batch {ESRGAN_BATCH}, bf16, fused Pallas RDB)"
        ),
        "vs_baseline": round(
            crops_per_sec / V100_ESRGAN_GAN_CROPS_PER_SEC, 3
        ),
    }))


def bench_srgan_gan() -> None:
    """SRGAN full adversarial step at the saturating batch (128):
    generator forward (vjp-reused for the gen update), discriminator
    update (2 forwards), VGG19-perceptual generator update, three Adam
    states.  Chained steps ending in a scalar readback."""
    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.trainer import SRGANTrainer

    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    args = Namespace(
        batch_size=BATCH, disable_amp=False, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan",
    )
    tl = SyntheticTrainLoader(BATCH, CROP, n_batches=2)
    el = SyntheticEvalLoader(BATCH, CROP, n_batches=1)
    trainer = SRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, mesh, ctx
    )
    # Multi-step scan path (production epoch loop); see bench_esrgan_gan.
    k = trainer.steps_per_call
    stacks = _stacked_device_batches(trainer, tl, k)

    state = trainer.state
    crops_k, flips_k = stacks[0]
    state, m = trainer.gan_step_multi(
        state, crops_k, flips_k, 1e-4, 1e-4, trainer.vgg_params
    )
    float(m["gen_loss"][-1])  # warmup completion readback

    calls = max(16 // k, 1)
    for _phase in range(2):
        start = time.perf_counter()
        for i in range(calls):
            crops_k, flips_k = stacks[i % len(stacks)]
            state, m = trainer.gan_step_multi(
                state, crops_k, flips_k, 1e-4, 1e-4,
                trainer.vgg_params
            )
        float(m["gen_loss"][-1])  # chain completion readback
        elapsed = time.perf_counter() - start
    steps = calls * k

    n_chips = len(mesh.devices.ravel())
    crops_per_sec = BATCH * steps / elapsed / n_chips
    print(json.dumps({
        "metric": "srgan_gan_step_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": (
            "crops/sec/chip (SRGAN full GAN step, 96x96 HR, batch 128, "
            "bf16)"
        ),
        "vs_baseline": round(
            crops_per_sec / V100_SRGAN_GAN_CROPS_PER_SEC, 3
        ),
    }))


def bench_tiled_inference() -> None:
    """Tiled overlap-blend 4x inference, 1080p -> 4K (BASELINE.md
    config 5), SRGAN tile 256 / overlap 16 / tile-batch 8 (round-5
    sweep: 256px tiles cut halo redundancy 1.343x -> 1.264x on the
    compute-bound frame, 115.1 -> 119.6 MP/s; tools/profile_infer.py
    --sweep); reports 4K output megapixels per second."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.infer.tiled import tiled_upscale
    from torchsr_tpu.models import SRGANGenerator

    gen = SRGANGenerator(dtype=jnp.bfloat16)
    tile = 256
    x0 = jnp.zeros((1, tile, tile, 3))
    variables = jax.device_put(
        gen.init(jax.random.PRNGKey(0), x0, train=False)
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((1080, 1920, 3)).astype(np.float32))

    def run():
        return tiled_upscale(
            infer_fn, frame, scale=4, tile=tile, overlap=16,
            tile_batch=8, params=variables,
        )

    out = run()
    float(out.mean())  # compile + warmup completion readback
    assert out.shape == (4320, 7680, 3)

    frames = 3
    for _phase in range(2):
        start = time.perf_counter()
        for _ in range(frames):
            out = run()
        float(out.mean())
        elapsed = time.perf_counter() - start

    per_frame = elapsed / frames
    out_mp_per_sec = 4320 * 7680 / 1e6 / per_frame
    print(json.dumps({
        "metric": "srgan_tiled_infer_output_mp_per_sec",
        "value": round(out_mp_per_sec, 2),
        "unit": (
            "4K-output MP/sec (SRGAN tiled 1080p->4K, tile 256, "
            "overlap 16, tile-batch 8, bf16)"
        ),
        "vs_baseline": round(
            out_mp_per_sec / V100_SRGAN_INFER_OUT_MP_PER_SEC, 3
        ),
    }))


def bench_esrgan_tiled_inference() -> None:
    """ESRGAN (the reference's default model) tiled 4x inference,
    1080p -> 4K: tile 64 / overlap 8 / tile-batch 16 — the measured
    optimum (64px tiles keep the fused Pallas RDB kernel active;
    larger tile batches measured flat, docs/benchmarks.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torchsr_tpu.infer.tiled import tiled_upscale
    from torchsr_tpu.models import ESRGANGenerator

    gen = ESRGANGenerator(dtype=jnp.bfloat16)
    tile = 64
    x0 = jnp.zeros((1, tile, tile, 3))
    variables = jax.device_put(
        gen.init(jax.random.PRNGKey(0), x0, train=False)
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.random((1080, 1920, 3)).astype(np.float32))

    def run():
        return tiled_upscale(
            infer_fn, frame, scale=4, tile=tile, overlap=8,
            tile_batch=16, params=variables,
        )

    out = run()
    float(out.mean())  # compile + warmup completion readback
    assert out.shape == (4320, 7680, 3)

    frames = 2
    for _phase in range(2):
        start = time.perf_counter()
        for _ in range(frames):
            out = run()
        float(out.mean())
        elapsed = time.perf_counter() - start

    per_frame = elapsed / frames
    out_mp_per_sec = 4320 * 7680 / 1e6 / per_frame
    print(json.dumps({
        "metric": "esrgan_tiled_infer_output_mp_per_sec",
        "value": round(out_mp_per_sec, 2),
        "unit": (
            "4K-output MP/sec (ESRGAN tiled 1080p->4K, tile 64, "
            "overlap 8, tile-batch 16, bf16, fused Pallas RDB)"
        ),
        # V100 fp16 estimate scales the SRGAN inference estimate by
        # the ESRGAN/SRGAN FLOP ratio (~23x RRDB trunk): ~2 MP/s.
        "vs_baseline": round(out_mp_per_sec / 2.0, 3),
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from torchsr_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.trainer import SRGANTrainer

    # Non-headline metrics are non-fatal: the LAST line (the SRGAN
    # training headline) must print even if a secondary bench hits a
    # transient tunnel/compile failure.  The regression gate
    # (tools/bench_regression.py) still fails on any missing metric.
    for bench in (
        bench_esrgan_gan,
        bench_srgan_gan,
        bench_esrgan_tiled_inference,
        bench_tiled_inference,
    ):
        try:
            bench()
        except Exception as exc:  # pragma: no cover - defensive
            print(f"bench {bench.__name__} failed: {exc!r}",
                  file=sys.stderr)

    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    args = Namespace(
        batch_size=BATCH, disable_amp=False, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan",
    )
    train_loader = SyntheticTrainLoader(BATCH, CROP, n_batches=4)
    eval_loader = SyntheticEvalLoader(BATCH, CROP, n_batches=1)
    trainer = SRGANTrainer(
        args, train_loader, eval_loader,
        train_loader.dataset_len, eval_loader.dataset_len, mesh, ctx,
    )

    # Multi-step scan path (production epoch loop): K steps per jitted
    # call; see trainer._build_steps.
    k = trainer.steps_per_call
    stacks = _stacked_device_batches(trainer, train_loader, k)

    state = trainer.state
    for i in range(max(WARMUP_STEPS // k, 1)):
        crops_k, flips_k = stacks[i % len(stacks)]
        state, losses = trainer.pretrain_step_multi(
            state, crops_k, flips_k
        )
    # A scalar READBACK (not block_until_ready, which async runtimes may
    # satisfy before real execution) guarantees compilation, executable
    # upload, and the warm-up steps have actually run.
    float(losses[-1])

    # Chained-dependency timing with a terminal scalar READBACK: each
    # call consumes the previous call's state (strict sequencing) and
    # the final float() cannot return until every step has actually
    # executed.  On tunneled/async runtimes, block_until_ready alone
    # can report completion early; a data readback cannot lie.
    # Two measured phases, keep the second (first-loop slowdown rule).
    calls = max(MEASURE_STEPS // k, 1)
    measured_steps = calls * k
    for _phase in range(2):
        start = time.perf_counter()
        loss_acc = None
        for i in range(calls):
            crops_k, flips_k = stacks[i % len(stacks)]
            state, losses = trainer.pretrain_step_multi(
                state, crops_k, flips_k
            )
            loss = jnp.sum(losses)
            loss_acc = loss if loss_acc is None else loss_acc + loss
        final = float(loss_acc)  # forces completion of the whole chain
        elapsed = time.perf_counter() - start

    per_step = elapsed / measured_steps
    n_chips = len(mesh.devices.ravel())
    crops_per_sec = BATCH / per_step / n_chips
    print(
        f"bench: {measured_steps} chained steps x {BATCH} crops in "
        f"{elapsed:.3f}s -> {per_step * 1000:.2f} ms/step on "
        f"{n_chips} chip(s); mean loss={final / measured_steps:.5f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "srgan_train_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 2),
        "unit": "crops/sec/chip (96x96 HR, batch 128, bf16)",
        "vs_baseline": round(
            crops_per_sec / V100_BASELINE_CROPS_PER_SEC, 3
        ),
    }))


if __name__ == "__main__":
    main()
