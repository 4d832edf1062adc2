"""AsyncCheckpointWriter: snapshot isolation, coalescing, errors.

The writer exists because the device->host fetch dominates checkpoint
cost (measured ~85 s for a full ESRGAN state through the tunneled
runtime) and previously blocked the epoch loop every ``-latest``/
``-best`` save.  These tests pin the properties that make the async
path safe:

- the on-device snapshot survives donation of the live buffers by the
  next training step (the core correctness hazard);
- latest-wins coalescing per path bounds queue depth and device memory;
- FIFO ordering across paths;
- worker errors surface at ``wait()``/``save()`` instead of vanishing.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchsr_tpu.utils.checkpoint as ckpt
from torchsr_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    device_snapshot,
    load_checkpoint,
)


def test_device_snapshot_survives_donation():
    """A snapshot taken before a donating dispatch must keep the
    pre-donation values (the live buffer is invalidated)."""
    x = jnp.arange(8.0)
    tree = {"params": {"w": x}, "count": 3}

    snap = device_snapshot(tree)
    assert snap["count"] == 3  # non-array leaves pass through

    donate = jax.jit(lambda v: v + 100.0, donate_argnums=0)
    bumped = donate(x)
    jax.block_until_ready(bumped)

    np.testing.assert_array_equal(
        np.asarray(snap["params"]["w"]), np.arange(8.0)
    )
    # and the snapshot is a distinct buffer, not an alias
    assert snap["params"]["w"] is not x


def test_async_write_matches_state_at_save_time(tmp_path):
    writer = AsyncCheckpointWriter()
    path = str(tmp_path / "m-psnr-latest.ckpt")

    x = jnp.full((4,), 7.0)
    writer.save(path, 5, "m-psnr", {"params": {"w": x}, "batch_stats": {}},
                extra={"step": jnp.asarray(11), "best_psnr": 1.5})
    # mutate the "live" buffer via donation while the write is pending
    jax.block_until_ready(jax.jit(lambda v: v * 0, donate_argnums=0)(x))
    writer.wait()

    loaded = load_checkpoint(path)
    assert loaded["epoch"] == 5 and loaded["phase"] == "m-psnr"
    np.testing.assert_array_equal(loaded["state"]["params"]["w"],
                                  np.full((4,), 7.0))
    assert int(loaded["extra"]["step"]) == 11
    assert loaded["extra"]["best_psnr"] == 1.5


def test_host_transform_runs_in_worker(tmp_path):
    writer = AsyncCheckpointWriter()
    path = str(tmp_path / "t.ckpt")
    thread_names = []

    def transform(gs):
        thread_names.append(threading.current_thread().name)
        return {"params": {"doubled": gs["params"]["w"] * 2}}

    writer.save(path, 1, "p", {"params": {"w": jnp.ones((2,))}},
                host_transform=transform)
    writer.wait()
    assert thread_names == ["ckpt-writer"]
    loaded = load_checkpoint(path)
    np.testing.assert_array_equal(loaded["state"]["params"]["doubled"],
                                  np.full((2,), 2.0))


def test_latest_wins_coalescing_and_fifo(tmp_path, monkeypatch):
    """Saves enqueued for the same path while the worker is busy
    collapse to the newest; distinct paths keep FIFO order."""
    written = []
    gate = threading.Event()
    real = ckpt.save_checkpoint

    def slow_save(path, epoch, phase, gen, extra=None):
        gate.wait(timeout=10)
        written.append((path, epoch))
        real(path, epoch, phase, gen, extra=extra)

    monkeypatch.setattr(ckpt, "save_checkpoint", slow_save)
    writer = AsyncCheckpointWriter()
    state = {"params": {"w": jnp.zeros((1,))}}

    a, b = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    writer.save(a, 1, "p", state)   # worker picks this up and blocks
    time.sleep(0.2)                 # let the worker dequeue job 1
    writer.save(b, 1, "p", state)
    writer.save(a, 2, "p", state)   # pending a.ckpt: no older job queued
    writer.save(a, 3, "p", state)   # replaces epoch-2 job
    gate.set()
    writer.wait()

    assert written == [(a, 1), (b, 1), (a, 3)]
    assert load_checkpoint(a)["epoch"] == 3
    assert load_checkpoint(b)["epoch"] == 1


def test_worker_error_is_sticky(tmp_path):
    writer = AsyncCheckpointWriter()

    def boom(gs):
        raise ValueError("disk on fire")

    writer.save(str(tmp_path / "x.ckpt"), 1, "p",
                {"params": {"w": jnp.zeros((1,))}}, host_transform=boom)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        writer.wait()
    # sticky: subsequent saves refuse too
    with pytest.raises(RuntimeError):
        writer.save(str(tmp_path / "y.ckpt"), 1, "p",
                    {"params": {"w": jnp.zeros((1,))}})


@pytest.mark.slow
def test_sync_saves_flag_wiring(tmp_path, monkeypatch):
    """--sync-saves disables the writer; _save then writes inline.
    Default args get a writer (single-process)."""
    import os
    from argparse import Namespace

    from torchsr_tpu.data.synthetic import (
        SyntheticEvalLoader,
        SyntheticTrainLoader,
    )
    from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
    from torchsr_tpu.train.trainer import SRGANTrainer

    monkeypatch.chdir(tmp_path)

    def build(**kw):
        args = Namespace(
            batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
            gan_checkpoint=None, psnr_checkpoint=None, seed=0,
            skip_image_save=True, model="srgan", num_residual=1,
            vgg_convs=2, **kw,
        )
        tl = SyntheticTrainLoader(8, 32, n_batches=1)
        el = SyntheticEvalLoader(8, 32, n_batches=1)
        ctx = DistributedContext(1, -1, -1, 1, False)
        return SRGANTrainer(
            args, tl, el, tl.dataset_len, el.dataset_len, make_mesh(), ctx
        )

    sync_tr = build(sync_saves=True)
    assert sync_tr.ckpt_writer is None
    sync_tr._save(1, "srgan-psnr", "latest")
    # no wait needed: the write happened inline
    assert os.path.exists("srgan-psnr-latest.ckpt")
    assert load_checkpoint("srgan-psnr-latest.ckpt")["epoch"] == 1

    async_tr = build()
    assert async_tr.ckpt_writer is not None
