"""Fused Pallas RDB kernel == the flax ResidualDenseBlock, exactly.

Interpreter mode on CPU (the compiled path is exercised and A/B-benched
on real TPU by tools/bench_rdb.py; measured faster than the XLA conv
lowering — see docs/benchmarks.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.models.esrgan import ResidualDenseBlock
from torchsr_tpu.ops.pallas.rdb import fused_rdb


def _params_and_ref(x, seed=0):
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(seed), x)["params"]
    ks = tuple(params[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
    bs = tuple(params[f"conv{i}"]["conv"]["bias"] for i in range(1, 6))
    return rdb.apply({"params": params}, x), ks, bs


@pytest.mark.parametrize("shape", [(2, 8, 16, 64), (1, 12, 8, 64)])
def test_fused_rdb_matches_flax(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, shape), jnp.float32)
    ref, ks, bs = _params_and_ref(x)
    out = fused_rdb(x, ks, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_fused_rdb_multi_image_blocks():
    """Several images per grid block: boundary masks must not leak
    pixels between images (biases make leakage visible)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 0.5, (4, 4, 8, 64)), jnp.float32)
    ref, ks, bs = _params_and_ref(x, seed=1)
    # nonzero biases so cross-image contamination shows up
    bs = tuple(jnp.asarray(rng.normal(0, 0.1, b.shape), jnp.float32)
               for b in bs)
    rdb = ResidualDenseBlock()
    params = rdb.init(jax.random.PRNGKey(1), x)["params"]
    for i in range(1, 6):
        params[f"conv{i}"]["conv"]["bias"] = bs[i - 1]
    ref = rdb.apply({"params": params}, x)
    out = fused_rdb(x, ks, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # each image's result must equal processing it alone
    solo = fused_rdb(x[1:2], ks, bs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(solo[0]), rtol=1e-5, atol=1e-5
    )
