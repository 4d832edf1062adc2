"""Device mesh construction and distributed environment detection.

Launcher parity: the reference reads torchrun env vars with a Slurm
fallback (reference torchsr.py:101-154).  We keep the same env surface so
existing launch scripts work, but it only configures
``jax.distributed.initialize`` — the TPU runtime handles rendezvous, and
all collectives are XLA collectives over ICI/DCN chosen by sharding
propagation, not NCCL calls.

Sharding model (the whole data-parallel story):
  * params/optimizer state: replicated — ``NamedSharding(mesh, P())``
  * batches: sharded over 'data'   — ``NamedSharding(mesh, P('data'))``
  * the jitted train step then compiles to per-device compute with one
    gradient psum over ICI, which is exactly DDP's allreduce without the
    wrapper.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class DistributedContext:
    """Resolved multi-process parameters (reference's distributed_params)."""

    world_size: int
    rank: int
    local_rank: int
    local_world_size: int
    distributed: bool

    @property
    def main_process(self) -> bool:
        # Single-process runs use rank -1, matching the reference's
        # convention (torchsr.py:147-151).
        return self.rank in (-1, 0)


def _distributed_client_active() -> bool:
    """True when jax's distributed runtime is already initialized (e.g.
    a launcher or an earlier detect_distributed call did it), WITHOUT
    touching the XLA backend the way jax.process_count() would."""
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:
        return False


def detect_distributed(
    master_addr: str | None = None, master_port: str | None = None
) -> DistributedContext:
    """Parse torchrun-style env vars with a Slurm fallback.

    Mirrors reference torchsr.py:101-154, including defaulting to
    world_size=1 / rank=-1 when no launcher env is present.  When a
    multi-process launch is detected, initializes JAX's distributed
    runtime (the NCCL-process-group equivalent, torchsr.py:258).
    """
    try:
        world_size = int(os.environ["WORLD_SIZE"])
        rank = int(os.environ["RANK"])
        local_rank = int(os.environ["LOCAL_RANK"])
        local_world_size = int(os.environ["LOCAL_WORLD_SIZE"])
        distributed = True
    except (KeyError, ValueError):
        try:
            world_size = int(os.environ["SLURM_NTASKS"])
            rank = int(os.environ["SLURM_PROCID"])
            local_rank = int(os.environ["SLURM_LOCALID"])
            local_world_size = int(os.environ["SLURM_NTASKS_PER_NODE"])
            os.environ["RANK"] = str(rank)
            os.environ["WORLD_SIZE"] = str(world_size)
            distributed = True
        except (KeyError, ValueError):
            distributed = False
    if not distributed:
        return DistributedContext(1, -1, -1, 1, False)

    if world_size > 1 and not _distributed_client_active():
        # NOTE: probing jax.process_count() here instead would
        # initialize the XLA backend and make jax.distributed.initialize
        # impossible ("must be called before any JAX calls") — the
        # idempotence check must not touch the backend.
        addr = master_addr or os.environ.get("MASTER_ADDR", "127.0.0.1")
        port = master_port or os.environ.get("MASTER_PORT", "29500")
        num_processes = world_size // max(local_world_size, 1) or 1
        if num_processes > 1:
            jax.distributed.initialize(
                coordinator_address=f"{addr}:{port}",
                num_processes=num_processes,
                process_id=rank // max(local_world_size, 1),
            )
    return DistributedContext(
        world_size, rank, local_rank, local_world_size, True
    )


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    """Build a 1-D data-parallel mesh over the available devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch-leading arrays (batch dim split over 'data')."""
    return NamedSharding(mesh, P(axis))


def stacked_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for (steps, batch, ...) stacks: axis 0 is the device-side
    scan dimension (replicated), axis 1 the data-parallel batch."""
    return NamedSharding(mesh, P(None, axis))


def put_stacked_batch(arrays, mesh: Mesh, axis: str = "data"):
    """Transfer a K-step batch stack, sharded on the batch dim (axis 1).

    Feeds the trainers' multi-step scan programs: K training steps run
    per jitted call (`lax.scan`), amortizing the per-call dispatch
    overhead (~4.5 ms through this platform's tunneled runtime — 38% of
    an SRGAN pretrain step) over K steps.
    """
    sharding = stacked_batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(arrays, sharding)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, a),
        arrays,
    )


def put_batch(arrays, mesh: Mesh, axis: str = "data"):
    """Transfer host batch arrays to the mesh, sharded on the batch dim.

    Single-process: a plain sharded device_put.  Multi-process: each host
    contributes its local shard of the global batch
    (``make_array_from_process_local_data``), replacing the reference's
    DistributedSampler + per-rank H2D copies.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.device_put(arrays, sharding)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, a),
        arrays,
    )
