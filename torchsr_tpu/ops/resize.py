"""Separable resampling as MXU matmuls, matching PIL's bicubic resampler.

The reference synthesizes LR training inputs by bicubic-downscaling the HR
crop through PIL (``Resize(..., InterpolationMode.BICUBIC)`` applied to a
PIL image; reference dataset.py:88-93 and :121-125).  PIL's resampler is an
*antialiased* separable convolution: when downscaling, the cubic kernel is
stretched by the scale factor so every input pixel contributes.

On TPU we express the same operation as two dense matrix products — one per
spatial axis — with weight matrices precomputed on the host to match PIL's
algorithm exactly (same kernel, same window clipping, same per-pixel weight
normalization).  An ``(H_out, H_in)`` matrix applied over the H axis and a
``(W_out, W_in)`` matrix over the W axis turn the whole batch resample into
two large matmuls, which is exactly what the MXU wants; XLA fuses the
uint8->float normalization and any flips into the first matmul's prologue.

PIL reference semantics implemented here (algorithm, not code, from the
Pillow documentation of ``Image.resize``):
  * ``scale = in_size / out_size``; ``filterscale = max(scale, 1.0)``
  * support of the bicubic filter is ``2.0 * filterscale``
  * output pixel ``i`` draws from input window centered at
    ``(i + 0.5) * scale``
  * weights are the Keys cubic kernel with ``a = -0.5`` evaluated at
    ``(j + 0.5 - center) / filterscale``, normalized over the clipped
    window.

PIL computes in 8-bit fixed point for uint8 images; we compute in float32,
so results can differ from PIL by ~1/255 per pixel (validated by golden
tests in tests/test_resize.py).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel (the PIL/Catmull-Rom variant, a=-0.5)."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * (x3 - 5.0 * x2 + 8.0 * x - 4.0), 0.0),
    )
    return out


@functools.lru_cache(maxsize=256)
def resample_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Precompute the PIL-compatible bicubic resampling matrix.

    Returns a dense float32 matrix ``M`` of shape ``(out_size, in_size)``
    such that ``y = M @ x`` resamples a length-``in_size`` signal to
    ``out_size`` with PIL ``Image.BICUBIC`` semantics (antialiased when
    downscaling, plain cubic interpolation when upscaling).
    """
    if in_size < 1 or out_size < 1:
        raise ValueError(f"invalid resample sizes {in_size} -> {out_size}")
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        j = np.arange(xmin, xmax)
        w = _cubic_kernel((j + 0.5 - center) / filterscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        mat[i, xmin:xmax] = w
    return mat.astype(np.float32)


def _quantize_pixels(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 1] and snap to the uint8 grid (k/255 values)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


def bicubic_resize(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    dtype: jnp.dtype | None = None,
    quantize: bool | None = None,
) -> jnp.ndarray:
    """Resize a batch of NHWC images with PIL-compatible bicubic resampling.

    Args:
      x: ``(..., H, W, C)`` array.  Integer inputs are treated as raw pixel
        values and converted to float in ``[0, 1]`` (matching the
        reference's ToPILImage -> Resize -> ToTensor round trip,
        dataset.py:88-93).  Float inputs are resampled as-is.
      out_hw: target ``(H_out, W_out)``.
      dtype: accumulation/output dtype; defaults to float32.
      quantize: emulate PIL's uint8 pipeline — it resamples the width
        axis first, *clamps and rounds to uint8* between passes, and again
        after the height pass.  Defaults to True for integer inputs
        (pixel semantics, exact parity with the reference's PIL path) and
        False for float inputs (pure float resample, e.g. feature maps).

    Returns:
      ``(..., H_out, W_out, C)`` array in ``dtype``.
    """
    dtype = dtype or jnp.float32
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw

    if quantize is None:
        quantize = bool(jnp.issubdtype(x.dtype, jnp.integer))
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(dtype) / 255.0
    else:
        x = x.astype(dtype)

    if (h_in, w_in) == (h_out, w_out):
        return x

    mh = jnp.asarray(resample_matrix(h_in, h_out), dtype=dtype)
    mw = jnp.asarray(resample_matrix(w_in, w_out), dtype=dtype)

    # Two MXU matmuls (one per axis); einsum keeps batch/channel dims
    # untouched so XLA lowers each contraction to a single dot_general.
    # PIL's order: width pass first, then height.
    if w_in != w_out:
        x = jnp.einsum(
            "ow,...hwc->...hoc", mw, x, preferred_element_type=dtype
        )
        if quantize:
            x = _quantize_pixels(x)
    if h_in != h_out:
        x = jnp.einsum(
            "oh,...hwc->...owc", mh, x, preferred_element_type=dtype
        )
        if quantize:
            x = _quantize_pixels(x)
    return x


def nearest_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample over NHWC spatial dims.

    TPU-native equivalent of the reference's
    ``F.interpolate(scale_factor=2, mode='nearest')``
    (esrgan/generator.py:73-78): a pure reshape/broadcast, which XLA fuses
    into the consuming convolution's input.
    """
    b = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = jnp.broadcast_to(
        x[..., :, None, :, None, :], (*b, h, factor, w, factor, c)
    )
    return x.reshape(*b, h * factor, w * factor, c)
