"""Loss formulas golden-tested against torch; PSNR/SSIM sanity."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from torchsr_tpu.train.losses import (
    bce_loss,
    bce_with_logits_loss,
    l1_loss,
    mse_loss,
)
from torchsr_tpu.train.metrics import psnr, psnr_per_sample, ssim


def test_mse_l1_match_torch():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    b = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    np.testing.assert_allclose(
        float(mse_loss(a, b)), float(F.mse_loss(ta, tb)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(l1_loss(a, b)), float(F.l1_loss(ta, tb)), rtol=1e-6
    )


def test_bce_matches_torch():
    rng = np.random.default_rng(1)
    p = rng.uniform(0.01, 0.99, size=(16, 1)).astype(np.float32)
    t = (rng.random((16, 1)) < 0.5).astype(np.float32)
    ours = float(bce_loss(p, t))
    ref = float(F.binary_cross_entropy(torch.from_numpy(p), torch.from_numpy(t)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 1)).astype(np.float32) * 5
    t = (rng.random((16, 1)) < 0.5).astype(np.float32)
    ours = float(bce_with_logits_loss(x, t))
    ref = float(
        F.binary_cross_entropy_with_logits(
            torch.from_numpy(x), torch.from_numpy(t)
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bce_saturation_is_finite():
    p = np.array([[0.0], [1.0]], dtype=np.float32)
    t = np.array([[1.0], [0.0]], dtype=np.float32)
    assert np.isfinite(float(bce_loss(p, t)))
    # matched saturation too: (1-t)*log1p(-1) must not produce 0 * -inf
    p2 = np.array([[1.0], [0.0]], dtype=np.float32)
    t2 = np.array([[1.0], [0.0]], dtype=np.float32)
    assert np.isfinite(float(bce_loss(p2, t2)))


def test_bce_gradient_finite_at_saturation():
    """Regression: a saturated discriminator (sigmoid output exactly 0
    or 1) must yield finite gradients — the maximum(log(p), c)
    formulation NaNs through the 0*inf pullback and killed GAN training
    within ~20 steps on real data."""
    import jax
    import jax.numpy as jnp

    def loss(logits):
        p = jax.nn.sigmoid(logits)
        return bce_loss(p, jnp.ones_like(p))

    # +-40 saturates float32 sigmoid to exactly 1.0 / 0.0
    for val in (40.0, -40.0):
        g = jax.grad(loss)(jnp.full((4, 1), val, jnp.float32))
        assert bool(jnp.isfinite(g).all()), f"non-finite grad at {val}"


def test_psnr_reference_formula():
    # PSNR = 10*log10(1/mse) exactly (reference srgan/trainer.py:296)
    a = np.zeros((1, 4, 4, 3), np.float32)
    b = np.full((1, 4, 4, 3), 0.1, np.float32)
    expected = 10 * np.log10(1 / 0.01)
    np.testing.assert_allclose(float(psnr(a, b)), expected, rtol=1e-5)
    per = np.asarray(psnr_per_sample(a, b))
    np.testing.assert_allclose(per, [expected], rtol=1e-5)


def test_ssim_bounds_and_identity():
    rng = np.random.default_rng(3)
    a = rng.random((2, 16, 16, 3)).astype(np.float32)
    assert float(ssim(a, a)) > 0.9999
    b = rng.random((2, 16, 16, 3)).astype(np.float32)
    val = float(ssim(a, b))
    assert -1.0 <= val <= 1.0
    assert val < 0.5  # independent noise should score low


def test_ssim_blur_matmuls_full_precision():
    """The SSIM moment matmuls must request HIGHEST precision: TPU's
    default multiplies f32 operands as bf16, and var = blur(x^2) - mu^2
    then cancels catastrophically (measured on v5e: negative variances,
    SSIM readings of -0.4..3.6 on smooth eval images).  Pinned via the
    jaxpr so a refactor can't silently drop the precision request."""
    import jax

    from torchsr_tpu.train.metrics import ssim_per_sample

    jaxpr = jax.make_jaxpr(ssim_per_sample)(
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
    )
    dots = [
        e.params.get("precision")
        for e in jaxpr.jaxpr.eqns
        if e.primitive.name == "dot_general"
    ]
    assert dots, "SSIM blur should lower to dot_general"
    for prec in dots:
        assert prec == (
            jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST
        ), prec


def test_ssim_smooth_low_variance_images_in_range():
    """Smooth, nearly-flat image pairs (the catastrophic-cancellation
    regime) stay within [-eps, 1+eps]."""
    from torchsr_tpu.train.metrics import ssim_per_sample

    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32) / 96
    hr = np.stack([0.3 + 0.4 * xx + 0.2 * yy] * 3, -1)[None]
    rng = np.random.default_rng(0)
    for noise in (0.0, 1e-4, 1e-3, 1e-2):
        sr = hr + rng.normal(0, noise, hr.shape).astype(np.float32)
        val = np.asarray(
            ssim_per_sample(jnp.asarray(sr), jnp.asarray(hr))
        )
        assert np.all(val <= 1.0 + 1e-5) and np.all(val >= -1e-5), (
            noise, val,
        )
