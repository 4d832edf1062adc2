"""Image quality metrics: PSNR (reference-parity formula) and SSIM.

PSNR reproduces the reference exactly: ``10 * log10(1 / MSE)`` on [0, 1]
pixels, averaged *per batch* then over batches (srgan/trainer.py:296,
:303).  SSIM is additive capability — the reference computes PSNR only —
required by the north-star eval (BASELINE.md): standard Gaussian-windowed
SSIM (11x11, sigma 1.5, K1=0.01, K2=0.03, data range 1.0), averaged over
channels, matching scikit-image/TF defaults.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(
    pred: jnp.ndarray, target: jnp.ndarray, mask_value: float | None = None
) -> jnp.ndarray:
    """Batch PSNR in dB over all pixels, identical to the reference."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean(jnp.square(pred - target))
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def psnr_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample PSNR (B,) — used for masked (padded-batch) evals."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean(
        jnp.square(pred - target), axis=tuple(range(1, pred.ndim))
    )
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Mean SSIM over a batch of NHWC images in [0, 1].

    The Gaussian filtering is separable: two depthwise 1-D convolutions
    per moment map, which XLA lowers to cheap strided convs on the VPU.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    window = jnp.asarray(_gaussian_window(window_size, sigma))

    def blur(x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C); filter over H then W, valid padding.
        c = x.shape[-1]
        kh = jnp.tile(window.reshape(window_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(window.reshape(1, window_size, 1, 1), (1, 1, 1, c))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kh.shape, ("NHWC", "HWIO", "NHWC")
        )
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=c,
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kw.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, kw, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=c,
        )

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = blur(pred)
    mu_t = blur(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    var_p = blur(pred * pred) - mu_pp
    var_t = blur(target * target) - mu_tt
    cov = blur(pred * target) - mu_pt

    ssim_map = ((2.0 * mu_pt + c1) * (2.0 * cov + c2)) / (
        (mu_pp + mu_tt + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(ssim_map)


def ssim_per_sample(
    pred: jnp.ndarray, target: jnp.ndarray, **kwargs
) -> jnp.ndarray:
    """Per-sample mean SSIM (B,) — used for masked (padded-batch) evals."""
    return jax.vmap(lambda p, t: ssim(p[None], t[None], **kwargs))(
        pred, target
    )
