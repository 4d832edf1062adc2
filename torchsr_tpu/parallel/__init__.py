"""Distributed/parallel subsystem: device meshes and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP stack
(torchsr.py:101-154, :258; srgan/trainer.py:142-157): a
``jax.sharding.Mesh`` over the slice's chips with params replicated and
the batch sharded over the 'data' axis.  XLA inserts the gradient
all-reduce over ICI; there is no rendezvous or wrapper module.
"""

from torchsr_tpu.parallel.mesh import (
    DistributedContext,
    batch_sharding,
    detect_distributed,
    make_mesh,
    put_batch,
    replicate,
)

__all__ = [
    "DistributedContext",
    "detect_distributed",
    "make_mesh",
    "replicate",
    "batch_sharding",
    "put_batch",
]
