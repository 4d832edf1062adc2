"""Multi-process worker: one data-parallel pretrain step on a 2-process
virtual-CPU cluster.  Launched by tests/test_multiprocess.py with
torchrun-style env vars; exercises the REAL multi-process branches:
``detect_distributed``'s rank->process mapping +
``jax.distributed.initialize`` (parallel/mesh.py:75-84) and
``put_batch``'s ``make_array_from_process_local_data``
(parallel/mesh.py:117-122) — the reference's NCCL PG + DistributedSampler
equivalents (torchsr.py:101-154, :258).
"""

import json
import os
import sys


def _train_mode(out_path: str, ctx, mesh) -> None:
    """Full two-phase ``train()`` across processes: exercises the
    multi-process ASYNC checkpoint path (collective device snapshot on
    every process, main-only enqueue, trainer.py ``_save``) and the
    all-process sample render (``_render_sample``'s global-mesh forward
    with main-gated I/O)."""
    import jax
    from argparse import Namespace

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.train.trainer import SRGANTrainer

    args = Namespace(
        batch_size=4,  # per process -> global batch 8 over 8 devices
        disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=False, sample_image=os.environ["SAMPLE_IMAGE"],
        model="srgan", num_residual=1, vgg_convs=2,
    )
    tl = SyntheticTrainLoader(4, 32, n_batches=1)
    el = SyntheticEvalLoader(4, 32, n_batches=1)
    trainer = SRGANTrainer(args, tl, el, 8, 8, mesh, ctx)
    assert trainer.async_saves, "async saves should be on by default"
    assert (trainer.ckpt_writer is not None) == ctx.main_process
    assert trainer.sample_image is not None, "all processes load the image"
    trainer.train()
    with open(out_path, "w") as fh:
        json.dump({
            "rank": ctx.rank,
            "process_index": int(jax.process_index()),
            "ok": True,
        }, fh)


def _esrgan_gan_mode(out_path: str, ctx, mesh) -> None:
    """ESRGAN GAN step with the FUSED Pallas RDB kernel (interpret
    mode) under a PROCESS-SPANNING mesh: the one component with
    hand-written SPMD (shard_map-wrapped pallas_call, rdb.py) executes
    across a real 2-process device mesh — the DDP-wrapped ESRGAN
    trainer analogue (reference esrgan/trainer.py:142-157)."""
    import jax
    import numpy as np
    from argparse import Namespace

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.train.trainer import ESRGANTrainer

    args = Namespace(
        batch_size=4,  # per process -> global batch 8 over 8 devices
        disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="esrgan", num_residual=1,
        vgg_convs=2, fused_rdb=True, pallas_interpret=True,
    )
    trainer = ESRGANTrainer(
        args, SyntheticTrainLoader(4, 32, n_batches=1),
        SyntheticEvalLoader(4, 32, n_batches=1), 8, 8, mesh, ctx,
    )
    rng = np.random.default_rng(321)
    global_crops = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    global_flips = rng.random((8, 2)) < 0.5
    lo = jax.process_index() * 4
    crops_dev, flips_dev = trainer._put(
        global_crops[lo:lo + 4], global_flips[lo:lo + 4]
    )
    state, metrics = trainer.gan_step(
        trainer.state, crops_dev, flips_dev, 1e-4, 1e-4,
        trainer.vgg_params,
    )
    leaves = jax.tree.leaves(jax.device_get(state.gen_params))
    with open(out_path, "w") as fh:
        json.dump({
            "rank": ctx.rank,
            "process_index": int(jax.process_index()),
            "disc_loss": float(metrics["disc_loss"]),
            "gen_loss": float(metrics["gen_loss"]),
            "fingerprint": float(
                sum(np.abs(l).sum() for l in leaves)
            ),
        }, fh)


def main() -> None:
    # Debugging aid: MP_WORKER_DUMP_AFTER=<secs> dumps all-thread
    # tracebacks to stderr if the worker is still alive then (hangs in
    # collective paths are otherwise invisible — the launcher only sees
    # a subprocess timeout).
    dump_after = float(os.environ.get("MP_WORKER_DUMP_AFTER", "0") or 0)
    if dump_after > 0:
        import faulthandler

        faulthandler.dump_traceback_later(dump_after, exit=True)

    out_path = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "step"
    rank = int(os.environ["RANK"])
    local_world = int(os.environ["LOCAL_WORLD_SIZE"])

    # The environment's TPU plugin ignores JAX_PLATFORMS; the config
    # knob must be set before any device use (CLAUDE.md rule #1).
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from torchsr_tpu.parallel.mesh import detect_distributed, make_mesh

    ctx = detect_distributed()
    assert ctx.distributed, "launcher env not detected"
    assert ctx.world_size == 8, ctx.world_size
    assert ctx.rank == rank
    # rank -> process mapping (2 processes x 4 local "ranks")
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank // local_world
    assert len(jax.devices()) == 8, "global device view"
    assert len(jax.local_devices()) == 4, "4 virtual CPU devices/process"
    assert ctx.main_process == (rank == 0)

    if mode == "train":
        _train_mode(out_path, ctx, make_mesh())
        return
    if mode == "esrgan_gan":
        _esrgan_gan_mode(out_path, ctx, make_mesh())
        return

    from argparse import Namespace

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.train.trainer import SRGANTrainer

    mesh = make_mesh()
    args = Namespace(
        batch_size=4,  # per process -> global batch 8 over 8 devices
        disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
    )
    trainer = SRGANTrainer(
        args, SyntheticTrainLoader(4, 32, n_batches=1),
        SyntheticEvalLoader(4, 32, n_batches=1), 8, 8, mesh, ctx,
    )

    # Deterministic GLOBAL batch; each process contributes its own
    # contiguous quarter pair (DistributedSampler-style sharding).
    rng = np.random.default_rng(123)
    global_crops = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    global_flips = rng.random((8, 2)) < 0.5
    lo = jax.process_index() * 4
    crops_dev, flips_dev = trainer._put(
        global_crops[lo:lo + 4], global_flips[lo:lo + 4]
    )
    state, loss = trainer.pretrain_step(trainer.state, crops_dev, flips_dev)

    # The production multi-step scan path through the multi-process
    # branch of put_stacked_batch: each process contributes its local
    # (K, localB, ...) slab of the global (K, B, ...) stack.
    global_crops2 = rng.integers(0, 256, (2, 8, 32, 32, 3), np.uint8)
    global_flips2 = rng.random((2, 8, 2)) < 0.5
    from torchsr_tpu.parallel.mesh import put_stacked_batch

    crops_k, flips_k = put_stacked_batch(
        (global_crops2[:, lo:lo + 4], global_flips2[:, lo:lo + 4]), mesh
    )
    state, losses_k = trainer.pretrain_step_multi(state, crops_k, flips_k)

    leaves = jax.tree.leaves(jax.device_get(state.gen_params))
    result = {
        "rank": rank,
        "process_index": int(jax.process_index()),
        "loss": float(loss),
        "multi_losses": [float(x) for x in losses_k],
        "fingerprint": float(sum(np.abs(l).sum() for l in leaves)),
        "first_leaf": np.asarray(leaves[0], np.float64)
        .ravel()[:8].tolist(),
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh)


if __name__ == "__main__":
    main()
