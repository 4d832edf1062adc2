"""Image quality metrics: PSNR (reference-parity formula) and SSIM.

PSNR reproduces the reference exactly: ``10 * log10(1 / batch_MSE)`` on
[0, 1] pixels — one log10 per batch over the whole batch's MSE, then
averaged over batches (srgan/trainer.py:296, :303); the eval loop builds
this from masked ``mse_per_sample`` so padded samples are excluded.
SSIM is additive capability — the reference computes PSNR only —
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


def mse_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample MSE (B,).

    The eval loop mask-averages these into a batch MSE and takes ONE
    log10 — the reference's batch PSNR (10*log10(1/batch_MSE),
    srgan/trainer.py:296).  Averaging per-sample PSNRs instead is >= the
    batch PSNR (Jensen) and not comparable to reference runs.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(
        jnp.square(pred - target), axis=tuple(range(1, pred.ndim))
    )


def psnr_per_sample(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample PSNR (B,) — per-image reporting (NOT the reference's
    batch formula; see ``mse_per_sample``)."""
    mse = mse_per_sample(pred, target)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=8)
def _gaussian_window(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


@functools.lru_cache(maxsize=32)
def _blur_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """Banded (n - w + 1, n) matrix applying a VALID 1-D Gaussian filter.

    Expressing the separable blur as two dense matmuls instead of
    grouped/depthwise convolutions matters on TPU: depthwise convs map
    poorly onto the MXU (and vmapping them per sample is pathologically
    slow), while an einsum over the spatial axis is a single large
    dot_general batched over batch and channels.
    """
    g = _gaussian_window(window_size, sigma)
    out = n - window_size + 1
    mat = np.zeros((out, n), dtype=np.float32)
    for i in range(out):
        mat[i, i:i + window_size] = g
    return mat


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Mean SSIM over a batch of NHWC images in [0, 1]."""
    return jnp.mean(
        ssim_per_sample(
            pred, target, window_size=window_size, sigma=sigma,
            k1=k1, k2=k2, data_range=data_range,
        )
    )


def ssim_per_sample(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
) -> jnp.ndarray:
    """Per-sample mean SSIM (B,) over NHWC batches.

    The separable Gaussian filtering is expressed as two banded-matrix
    einsums over the spatial axes — single MXU dot_generals batched over
    (batch, channel) — rather than depthwise convolutions, which TPU
    handles poorly.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    h, w = pred.shape[1], pred.shape[2]
    gh = jnp.asarray(_blur_matrix(h, window_size, sigma))
    gw = jnp.asarray(_blur_matrix(w, window_size, sigma))

    # HIGHEST precision is load-bearing on TPU: the default matmul
    # precision multiplies f32 operands as bf16, and the moment
    # formulas below (var = blur(x^2) - mu^2) catastrophically cancel
    # under a 2^-9 relative error — negative variances, SSIM readings
    # of -0.4..3.6 on a real eval (round 4, v5e).  SSIM is a
    # negligible share of eval compute; full f32 passes are free.
    def blur(x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.einsum("oh,bhwc->bowc", gh, x,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("ow,bhwc->bhoc", gw, x,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

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
    return jnp.mean(ssim_map, axis=(1, 2, 3))
