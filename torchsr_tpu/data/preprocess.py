"""Fused on-device LR/HR pair synthesis.

The reference synthesizes training pairs on 16 CPU worker processes per
rank: PIL decode -> RandomCrop -> RandomH/VFlip -> ToTensor for the HR,
then ToPILImage -> bicubic Resize -> ToTensor for the LR (reference
dataset.py:88-125) — the classic input-bound bottleneck.  Here the host
only decodes and slices uint8 crops; this module is the device half:

    uint8 HR crops (B, S, S, 3)  +  per-sample flip bits (B, 2)
        -> HR float (B, S, S, 3) in [0, 1]
        -> LR float (B, S/4, S/4, 3) via PIL-compatible antialiased
           bicubic (two MXU matmuls, torchsr_tpu.ops.resize)

Everything is one jitted function: XLA fuses the uint8->float normalize
and the flip selects into the first resample matmul, so the whole
synthesis is two small matmuls plus one elementwise epilogue per batch.

Like the reference, the LR is derived from the *uint8-quantized* HR crop
(PIL round-trips through an 8-bit image), which our uint8-in design
reproduces exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from torchsr_tpu.ops.resize import bicubic_resize


def _apply_flips(hr: jnp.ndarray, flips: jnp.ndarray) -> jnp.ndarray:
    """Apply per-sample horizontal/vertical flips.

    flips: (B, 2) bool — [:, 0] horizontal (reverse W), [:, 1] vertical
    (reverse H), matching torchvision RandomHorizontal/VerticalFlip.
    """
    hflip = flips[:, 0][:, None, None, None]
    vflip = flips[:, 1][:, None, None, None]
    hr = jnp.where(hflip, hr[:, :, ::-1, :], hr)
    hr = jnp.where(vflip, hr[:, ::-1, :, :], hr)
    return hr


@functools.partial(jax.jit, static_argnames=("upscale_factor",))
def synthesize_pair(
    crops_u8: jnp.ndarray,
    flips: jnp.ndarray,
    upscale_factor: int = 4,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 HR crops + flip bits -> (lr, hr) float32 batches in [0, 1]."""
    hr = crops_u8.astype(jnp.float32) / 255.0
    hr = _apply_flips(hr, flips)
    size = hr.shape[1]
    lr_size = size // upscale_factor
    # quantize=True matches PIL's two-pass uint8 quantization semantics:
    # values land exactly on the k/255 grid like the reference's
    # ToPILImage->Resize->ToTensor round trip, within ~1/255 per pixel
    # (PIL filters in 8-bit fixed point, this path in float32 — see
    # ops/resize.py).
    lr = bicubic_resize(hr, (lr_size, lr_size), quantize=True)
    return lr, hr


@functools.partial(jax.jit, static_argnames=("upscale_factor",))
def synthesize_eval_triple(
    crops_u8: jnp.ndarray,
    upscale_factor: int = 4,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """uint8 HR crops -> (lr, bicubic_up, hr), no augmentation.

    Mirrors the reference's TestData triple (dataset.py:181-217): the
    middle element is the naive bicubic 4x re-upscale of the LR, kept for
    comparison plots/metrics.
    """
    hr = crops_u8.astype(jnp.float32) / 255.0
    size = hr.shape[1]
    lr_size = size // upscale_factor
    lr = bicubic_resize(hr, (lr_size, lr_size), quantize=True)
    bic = bicubic_resize(lr, (size, size), quantize=True)
    return lr, bic, hr


def make_train_preprocess(upscale_factor: int = 4):
    """Return the jitted train-pair synthesis fn for this scale."""
    return functools.partial(
        synthesize_pair, upscale_factor=upscale_factor
    )


def make_eval_preprocess(upscale_factor: int = 4):
    """Return the jitted eval-triple synthesis fn for this scale."""
    return functools.partial(
        synthesize_eval_triple, upscale_factor=upscale_factor
    )
