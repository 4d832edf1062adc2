"""Pixel-pair-packed Pallas conv == the XLA conv lowering, exactly.

Interpreter mode on CPU (the compiled path is A/B-benched on real TPU
by tools/bench_pair_conv.py; see docs/benchmarks.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.ops.pallas.pair_conv import (
    conv_reference,
    pair_conv,
    pair_conv_supported,
)


def _inputs(shape, seed=0, bias=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 0.5, shape), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.float32)
    b = (
        jnp.asarray(rng.normal(0, 0.2, (64,)), jnp.float32)
        if bias else None
    )
    return x, k, b


@pytest.mark.parametrize(
    "shape",
    # even widths (pair packing); odd heights allowed; W=2 edge case
    # (every pair touches both image edges); multi-image blocks
    [(2, 8, 16, 64), (1, 12, 8, 64), (2, 5, 10, 64), (1, 3, 2, 64),
     (4, 4, 6, 64)],
)
def test_pair_conv_matches_xla(shape):
    x, k, b = _inputs(shape)
    ref = conv_reference(x, k, b)
    out = pair_conv(x, k, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pair_conv_no_bias():
    x, k, _ = _inputs((2, 6, 8, 64), seed=1, bias=False)
    ref = conv_reference(x, k)
    out = pair_conv(x, k, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pair_conv_multi_image_blocks_no_leak():
    """Several images per grid block: the positional masks must not
    leak pixels across image boundaries."""
    x, k, b = _inputs((4, 4, 8, 64), seed=2)
    out = pair_conv(x, k, b, interpret=True)
    solo = pair_conv(x[1:2], k, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(solo[0]), rtol=1e-5, atol=1e-5
    )


def test_pair_conv_gradients_match_jax_grad():
    """The custom-VJP Pallas backward == jax.grad of the XLA conv for
    the input, the kernel, and the bias."""
    x, k, b = _inputs((2, 6, 10, 64), seed=3)
    cot = jnp.asarray(
        np.random.default_rng(9).normal(0, 1, x.shape), jnp.float32
    )

    ref = jax.grad(
        lambda x, k, b: jnp.sum(conv_reference(x, k, b) * cot),
        argnums=(0, 1, 2),
    )(x, k, b)
    got = jax.grad(
        lambda x, k, b: jnp.sum(pair_conv(x, k, b, interpret=True) * cot),
        argnums=(0, 1, 2),
    )(x, k, b)

    for name, r, g in zip(("dx", "dk", "db"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_pair_conv_gradients_multi_image():
    """dW accumulates across grid steps (multi-image blocks + several
    blocks)."""
    x, k, b = _inputs((6, 4, 4, 64), seed=4)
    cot = jnp.asarray(
        np.random.default_rng(10).normal(0, 1, x.shape), jnp.float32
    )
    ref = jax.grad(
        lambda k: jnp.sum(conv_reference(x, k, b) * cot)
    )(k)
    got = jax.grad(
        lambda k: jnp.sum(pair_conv(x, k, b, interpret=True) * cot)
    )(k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_pair_conv_shard_map_matches_single_device():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x, k, b = _inputs((8, 6, 8, 64), seed=5)

    def loss(x, k, b, mesh=None):
        return jnp.sum(pair_conv(x, k, b, interpret=True, mesh=mesh) ** 2)

    ref = jax.grad(loss, argnums=(0, 1, 2))(x, k, b)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    bs = jax.device_put(b, NamedSharding(mesh, P()))
    got = jax.jit(
        jax.grad(lambda x, k, b: loss(x, k, b, mesh=mesh),
                 argnums=(0, 1, 2))
    )(xs, ks, bs)
    # atol covers f32 summation-order noise in the psum'd weight grads
    # (per-shard partial sums reduce in a different order).
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-4, atol=2e-4
        )


def test_pair_conv_support_gate():
    assert pair_conv_supported((2, 8, 16, 64))
    assert not pair_conv_supported((2, 8, 15, 64))  # odd width
    assert not pair_conv_supported((2, 8, 16, 32))  # wrong channels
    assert not pair_conv_supported(
        (2, 8, 16, 64), kernel_shape=(5, 5, 64, 64)
    )
    with pytest.raises(ValueError):
        pair_conv(
            jnp.zeros((1, 4, 5, 64)), jnp.zeros((3, 3, 64, 64)),
            interpret=True,
        )
