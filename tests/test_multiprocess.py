"""Multi-process data parallelism, executed for real on CPU.

Spawns TWO OS processes (4 virtual CPU devices each, torchrun-style env
vars, a real ``jax.distributed.initialize`` rendezvous over localhost)
and runs one sharded pretrain step through the multi-process branches of
``detect_distributed`` and ``put_batch`` — then asserts the result is
numerically IDENTICAL to the same global batch on a single-process
8-device mesh (the multi-node NCCL/DDP story of the reference,
torchsr.py:101-154, :258, executed the JAX way).
"""

import json
import os
import socket
import subprocess
import sys
from argparse import Namespace

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_workers(tmp_path, mode: str = "step", extra_env=None):
    """Run tests/_mp_worker.py in 2 real OS processes (4 virtual CPU
    devices each, torchrun-style env, jax.distributed rendezvous over
    localhost) and return their result JSONs."""
    port = _free_port()
    procs = []
    outs = []
    for proc_id in range(2):
        rank = proc_id * 4  # LOCAL_RANK 0 of each 4-local-rank process
        out = str(tmp_path / f"result_{proc_id}.json")
        outs.append(out)
        env = {
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "WORLD_SIZE": "8",
            "RANK": str(rank),
            "LOCAL_RANK": "0",
            "LOCAL_WORLD_SIZE": "4",
            "MASTER_ADDR": "127.0.0.1",
            "MASTER_PORT": str(port),
            "PYTHONPATH": REPO + os.pathsep
            + os.environ.get("PYTHONPATH", ""),
            **(extra_env or {}),
        }
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mp_worker.py"),
             out, mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=str(tmp_path),
        ))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr[-4000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_two_process_pretrain_step_matches_single_process(tmp_path):
    results = _launch_workers(tmp_path, "step")
    assert {r["process_index"] for r in results} == {0, 1}
    assert {r["rank"] for r in results} == {0, 4}
    # Replicated outputs are identical across processes.
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["fingerprint"] == results[1]["fingerprint"]
    assert results[0]["first_leaf"] == results[1]["first_leaf"]

    # Single-process reference: same global batch on this test process's
    # own 8-device mesh.
    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.trainer import SRGANTrainer

    import jax

    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
    )
    trainer = SRGANTrainer(
        args, SyntheticTrainLoader(8, 32, n_batches=1),
        SyntheticEvalLoader(8, 32, n_batches=1), 8, 8, make_mesh(),
        DistributedContext(1, -1, -1, 1, False),
    )
    rng = np.random.default_rng(123)
    global_crops = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    global_flips = rng.random((8, 2)) < 0.5
    crops_dev, flips_dev = trainer._put(global_crops, global_flips)
    state, loss = trainer.pretrain_step(trainer.state, crops_dev, flips_dev)

    # Mirror the workers' second phase: a 2-step stacked scan call.
    from torchsr_tpu.parallel.mesh import put_stacked_batch

    global_crops2 = rng.integers(0, 256, (2, 8, 32, 32, 3), np.uint8)
    global_flips2 = rng.random((2, 8, 2)) < 0.5
    crops_k, flips_k = put_stacked_batch(
        (global_crops2, global_flips2), trainer.mesh
    )
    state, losses_k = trainer.pretrain_step_multi(state, crops_k, flips_k)

    np.testing.assert_allclose(
        float(loss), results[0]["loss"], rtol=1e-6,
        err_msg="multi-process loss != single-process loss",
    )
    np.testing.assert_allclose(
        [float(x) for x in losses_k], results[0]["multi_losses"],
        rtol=1e-6,
        err_msg="multi-process scanned losses != single-process",
    )
    leaves = jax.tree.leaves(jax.device_get(state.gen_params))
    np.testing.assert_allclose(
        np.asarray(leaves[0], np.float64).ravel()[:8],
        np.asarray(results[0]["first_leaf"]),
        rtol=1e-6, atol=1e-7,
        err_msg="multi-process updated params != single-process",
    )
    np.testing.assert_allclose(
        float(sum(np.abs(l).sum() for l in leaves)),
        results[0]["fingerprint"], rtol=1e-6,
    )


@pytest.mark.slow
def test_two_process_full_train_with_async_saves(tmp_path):
    """Full two-phase ``train()`` across 2 real processes with the
    ASYNC checkpoint path active: every process participates in the
    collective on-device snapshot, only rank 0 streams the writes, and
    the sample render's global-mesh forward runs on all processes with
    main-gated I/O.  Asserts the reference's checkpoint/output file
    contract lands on the shared working directory."""
    from PIL import Image

    rng = np.random.default_rng(3)
    sample = tmp_path / "sample.png"
    Image.fromarray(
        rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
    ).save(sample)

    results = _launch_workers(
        tmp_path, "train", extra_env={"SAMPLE_IMAGE": str(sample)}
    )
    assert {r["process_index"] for r in results} == {0, 1}
    assert all(r["ok"] for r in results)

    for name in (
        "srgan-psnr-latest.ckpt", "srgan-psnr-best.ckpt",
        "srgan-gan-latest.ckpt", "srgan-gan-best.ckpt",
    ):
        assert (tmp_path / name).exists(), name
    assert (tmp_path / "output" / "SR_epoch1.png").exists()

    from torchsr_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(str(tmp_path / "srgan-gan-best.ckpt"))
    assert ckpt["epoch"] == 1 and ckpt["phase"] == "srgan-gan"
    assert "extra" in ckpt  # lossless-resume payload rode the async path
    import jax

    for leaf in jax.tree.leaves(ckpt["state"]["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_two_process_esrgan_fused_rdb_gan_step(tmp_path):
    """The shard_map-wrapped Pallas RDB kernel (interpret mode) under a
    real 2-process mesh: the ESRGAN GAN step runs, replicated outputs
    agree across processes, and the result matches the same global
    batch on a single-process 8-device mesh."""
    results = _launch_workers(tmp_path, "esrgan_gan")
    assert {r["process_index"] for r in results} == {0, 1}
    assert results[0]["disc_loss"] == results[1]["disc_loss"]
    assert results[0]["gen_loss"] == results[1]["gen_loss"]
    assert results[0]["fingerprint"] == results[1]["fingerprint"]

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.trainer import ESRGANTrainer

    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="esrgan", num_residual=1,
        vgg_convs=2, fused_rdb=True, pallas_interpret=True,
    )
    trainer = ESRGANTrainer(
        args, SyntheticTrainLoader(8, 32, n_batches=1),
        SyntheticEvalLoader(8, 32, n_batches=1), 8, 8, make_mesh(),
        DistributedContext(1, -1, -1, 1, False),
    )
    rng = np.random.default_rng(321)
    global_crops = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    global_flips = rng.random((8, 2)) < 0.5
    crops_dev, flips_dev = trainer._put(global_crops, global_flips)
    _state, metrics = trainer.gan_step(
        trainer.state, crops_dev, flips_dev, 1e-4, 1e-4,
        trainer.vgg_params,
    )
    np.testing.assert_allclose(
        float(metrics["disc_loss"]), results[0]["disc_loss"], rtol=1e-5,
        err_msg="multi-process ESRGAN disc loss != single-process",
    )
    np.testing.assert_allclose(
        float(metrics["gen_loss"]), results[0]["gen_loss"], rtol=1e-5,
        err_msg="multi-process ESRGAN gen loss != single-process",
    )
