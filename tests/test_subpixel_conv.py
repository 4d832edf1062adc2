"""Polyphase subpixel-space convolution == direct HR convolution.

Validates ops/subpixel_conv.py across kernel sizes and scales, plus the
generator-level equivalence between fused and direct head/tail paths
(identical parameter trees by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator
from torchsr_tpu.ops.subpixel_conv import conv_subpixel_space


@pytest.mark.parametrize("k,r,cin,cout", [
    (9, 4, 64, 3),   # the SRGAN head
    (3, 4, 64, 3),   # the ESRGAN head
    (3, 4, 16, 16),  # ESRGAN tail convs (reduced channels)
    (3, 2, 8, 8),    # 2x fold (ESRGAN upsample1)
    (5, 4, 16, 5),   # odd sizes
    (9, 2, 8, 3),
])
def test_matches_direct_conv(k, r, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2 * r, 3 * r, cin)),
                    jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn
    ) + b
    ours = conv_subpixel_space(x, w, b, r)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), atol=5e-5
    )


def test_gradients_flow():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 2)) * 0.1, jnp.float32)
    b = jnp.zeros((2,), jnp.float32)

    def loss(w):
        return jnp.mean(conv_subpixel_space(x, w, b, 4) ** 2)

    g = jax.grad(loss)(w)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_srgan_fused_head_equals_direct():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    fused = SRGANGenerator(num_residual=1, fused_head=True)
    direct = SRGANGenerator(num_residual=1, fused_head=False)
    v = fused.init(jax.random.PRNGKey(0), x, train=False)
    # identical param tree -> same variables apply to both
    y1 = fused.apply(v, x, train=False)
    y2 = direct.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), atol=5e-5
    )


def test_esrgan_fused_tail_equals_direct():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    fused = ESRGANGenerator(num_rrdb_blocks=1, fused_tail=True)
    direct = ESRGANGenerator(num_rrdb_blocks=1, fused_tail=False)
    v = fused.init(jax.random.PRNGKey(0), x, train=False)
    y1 = fused.apply(v, x, train=False)
    y2 = direct.apply(v, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), atol=5e-5
    )


def test_partially_folded_head_equals_subpixel_space():
    """conv_head_partially_folded(pre-d2s tensor) == conv_subpixel_space
    (post-d2s tensor): the upsample stage's depth_to_space folds into
    the head kernel exactly — values AND gradients."""
    from torchsr_tpu.ops.pixel_shuffle import depth_to_space
    from torchsr_tpu.ops.subpixel_conv import (
        conv_head_partially_folded,
        conv_subpixel_space,
    )

    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(0, 0.5, (2, 6, 8, 256)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (3,)), jnp.float32)
    for k in (9, 3):
        w = jnp.asarray(rng.normal(0, 0.1, (k, k, 64, 3)), jnp.float32)
        ref = conv_subpixel_space(depth_to_space(y, 2), w, b, 4)
        got = conv_head_partially_folded(y, w, b, 4, 2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    w = jnp.asarray(rng.normal(0, 0.1, (9, 9, 64, 3)), jnp.float32)
    g_ref = jax.grad(
        lambda w, y: jnp.sum(
            conv_subpixel_space(depth_to_space(y, 2), w, b, 4) ** 2
        ),
        argnums=(0, 1),
    )(w, y)
    g_got = jax.grad(
        lambda w, y: jnp.sum(conv_head_partially_folded(y, w, b, 4, 2) ** 2),
        argnums=(0, 1),
    )(w, y)
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4, rtol=1e-4
        )
