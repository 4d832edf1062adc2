"""Sharded tiled inference == single-device tiled inference (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from torchsr_tpu.infer.multichip import tiled_upscale_sharded
from torchsr_tpu.infer.tiled import tiled_upscale
from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator
from torchsr_tpu.parallel.mesh import make_mesh, replicate


def test_esrgan_fused_rdb_sharded_matches_single_device():
    """The flagship config: ESRGAN with the fused Pallas RDB forced on
    (interpret mode off-TPU).  The forward runs inside shard_map, so
    the Pallas kernel only sees local tile shards — the all-gather/
    replication pathology sharding propagation would hit
    (ops/pallas/rdb.py docstring) is structurally unreachable."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((40, 56, 3)), jnp.float32)

    gen = ESRGANGenerator(
        num_rrdb_blocks=1, fused_rdb=True, pallas_interpret=True
    )
    variables = gen.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)), train=False
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    single = tiled_upscale(
        jax.jit(infer_fn), img, scale=4, tile=16, overlap=4,
        tile_batch=4, params=variables,
    )

    mesh = make_mesh()
    v_rep = replicate(variables, mesh)
    sharded = tiled_upscale_sharded(
        infer_fn, v_rep, img, mesh, scale=4, tile=16, overlap=4,
        tile_batch_per_device=1,
    )
    assert sharded.shape == single.shape == (160, 224, 3)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=2e-5
    )


def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((70, 90, 3)), jnp.float32)

    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )

    def infer_fn(v, batch):
        return gen.apply(v, batch, train=False)

    single = tiled_upscale(
        jax.jit(infer_fn), img, scale=4, tile=32, overlap=8,
        tile_batch=4, params=variables,
    )

    mesh = make_mesh()
    assert mesh.devices.size == 8
    v_rep = replicate(variables, mesh)
    sharded = tiled_upscale_sharded(
        infer_fn, v_rep, img, mesh, scale=4, tile=32, overlap=8,
        tile_batch_per_device=1,
    )
    assert sharded.shape == single.shape == (280, 360, 3)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=2e-5
    )
