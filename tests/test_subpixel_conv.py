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
