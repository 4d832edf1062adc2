"""Data-parallel mesh tests on the virtual 8-device CPU backend."""

import os
import sys

import jax
import numpy as np
import pytest

from torchsr_tpu.parallel.mesh import (
    DistributedContext,
    batch_sharding,
    detect_distributed,
    make_mesh,
    put_batch,
    replicate,
)


def test_make_mesh_and_sharding():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    sub = make_mesh(4)
    assert sub.devices.size == 4


def test_put_batch_shards_over_devices():
    mesh = make_mesh()
    arr = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    (dev_arr,) = put_batch((arr,), mesh)
    assert dev_arr.sharding == batch_sharding(mesh)
    # each device holds 1/8 of the batch
    shard = dev_arr.addressable_shards[0]
    assert shard.data.shape == (1, 4)
    np.testing.assert_array_equal(np.asarray(dev_arr), arr)


def test_replicate():
    mesh = make_mesh()
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_detect_distributed_default(monkeypatch):
    for var in (
        "WORLD_SIZE", "RANK", "LOCAL_RANK", "LOCAL_WORLD_SIZE",
        "SLURM_NTASKS", "SLURM_PROCID", "SLURM_LOCALID",
        "SLURM_NTASKS_PER_NODE",
    ):
        monkeypatch.delenv(var, raising=False)
    ctx = detect_distributed()
    assert ctx == DistributedContext(1, -1, -1, 1, False)
    assert ctx.main_process


def test_detect_distributed_torchrun_env(monkeypatch):
    monkeypatch.setenv("WORLD_SIZE", "8")
    monkeypatch.setenv("RANK", "3")
    monkeypatch.setenv("LOCAL_RANK", "3")
    monkeypatch.setenv("LOCAL_WORLD_SIZE", "8")
    ctx = detect_distributed()
    assert ctx.world_size == 8 and ctx.rank == 3
    assert ctx.distributed and not ctx.main_process


def test_detect_distributed_slurm_env(monkeypatch):
    for var in ("WORLD_SIZE", "RANK", "LOCAL_RANK", "LOCAL_WORLD_SIZE"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_PROCID", "0")
    monkeypatch.setenv("SLURM_LOCALID", "0")
    monkeypatch.setenv("SLURM_NTASKS_PER_NODE", "4")
    ctx = detect_distributed()
    assert ctx.world_size == 4 and ctx.rank == 0 and ctx.main_process
    # re-exported for downstream tools (reference torchsr.py:140-141)
    assert os.environ["WORLD_SIZE"] == "4"


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_compiles():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as graft

    fn, (params, x) = graft.entry()
    out = jax.jit(fn)(params, x)
    assert out.shape == (x.shape[0], x.shape[1] * 4, x.shape[2] * 4, 3)
