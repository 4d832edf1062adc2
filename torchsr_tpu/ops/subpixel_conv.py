"""Polyphase (subpixel-space) convolution for few-channel HR heads.

The SRGAN generator ends with a 9x9 conv from 64 channels to **3** at
full HR resolution (reference srgan/generator.py:58).  On TPU, a
3-output-channel conv strands 125 of the MXU's 128 output lanes, and
because it runs at 4x resolution it dominates the whole forward pass
(measured: ~75% of inference time).

This module computes the *same* convolution in subpixel space: the HR
tensor is ``space_to_depth``-folded by the upscale factor r, the 9x9
HR kernel is exactly repacked into a KxK kernel over C*r^2 = 1024 input
and C_out*r^2 = 48 output channels (zero-filled where HR taps fall
outside the 9x9 support), and the result is ``depth_to_space``-unfolded.
Identity used: for HR position y = r*Y + p and tap offset dy,
``y + dy = r*(Y + D) + i`` with ``D = floor((p+dy)/r)`` and
``i = (p+dy) mod r`` — so each (phase p, phase i) pair maps to exactly
one HR tap per LR displacement D.

The repacking is mathematically exact (same multiplies, same zero
padding semantics as SAME); only the f32 accumulation order differs.
Measured on v5e: ~7x faster than the direct HR conv for the SRGAN head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from torchsr_tpu.ops.pixel_shuffle import depth_to_space, space_to_depth


@functools.lru_cache(maxsize=16)
def _phase_indices(k: int, r: int):
    """Static gather indices/mask for repacking a k-tap axis at scale r.

    Returns (taps K, index array (K, r_in_phase, r_out_phase), valid
    mask, LR padding (lo, hi)).
    """
    half = k // 2
    d_min = -((half + r - 1) // r)          # floor((0 - half) / r)
    d_max = (r - 1 + half) // r
    taps = d_max - d_min + 1
    a = np.arange(taps)[:, None, None]       # LR displacement index
    i = np.arange(r)[None, :, None]          # input phase
    p = np.arange(r)[None, None, :]          # output phase
    idx = (d_min + a) * r + i - p + half
    valid = (idx >= 0) & (idx < k)
    return taps, np.clip(idx, 0, k - 1), valid, (-d_min, d_max)


def subpixel_space_kernel(w: jnp.ndarray, scale: int) -> tuple[jnp.ndarray, tuple]:
    """Repack an HR conv kernel (k, k, C, Co) into subpixel space.

    Returns the (K, K, C*r^2, Co*r^2) kernel and the LR spatial padding
    that reproduces SAME semantics at HR.
    """
    k = w.shape[0]
    c_in, c_out = w.shape[2], w.shape[3]
    r = scale
    taps, idx, valid, pad = _phase_indices(k, r)

    # Gather HR taps for the H axis then the W axis.
    w1 = jnp.take(w, jnp.asarray(idx.reshape(-1)), axis=0)
    w1 = w1.reshape(taps, r, r, k, c_in, c_out)
    w1 = w1 * jnp.asarray(
        valid.reshape(taps, r, r, 1, 1, 1), w.dtype
    )
    w2 = jnp.take(w1, jnp.asarray(idx.reshape(-1)), axis=3)
    w2 = w2.reshape(taps, r, r, taps, r, r, c_in, c_out)
    w2 = w2 * jnp.asarray(
        valid.reshape(1, 1, 1, taps, r, r, 1, 1), w.dtype
    )
    # axes: (ay, i, p, ax, j, q, ci, co)
    #    -> (ay, ax, ci, i, j, co, p, q): input channel order (ci, i, j)
    #       and output channel order (co, p, q) match
    #       space_to_depth / depth_to_space packing.
    w2 = w2.transpose(0, 3, 6, 1, 4, 7, 2, 5)
    kernel = w2.reshape(taps, taps, c_in * r * r, c_out * r * r)
    return kernel, (pad, pad)


def conv_subpixel_space(
    x_hr: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    scale: int,
) -> jnp.ndarray:
    """SAME conv of an HR NHWC tensor, computed in subpixel space."""
    r = scale
    kernel, padding = subpixel_space_kernel(w, r)
    folded = space_to_depth(x_hr, r)
    dn = jax.lax.conv_dimension_numbers(
        folded.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    # No preferred_element_type upcast: its transpose rule mixes dtypes
    # under autodiff, and TPU bf16 convs accumulate in f32 regardless.
    out = jax.lax.conv_general_dilated(
        folded, kernel, (1, 1), padding, dimension_numbers=dn
    )
    if b is not None:
        out = out + jnp.repeat(b, r * r).astype(out.dtype)
    return depth_to_space(out, r)


@functools.lru_cache(maxsize=16)
def _partial_fold_indices(k: int, r: int, g: int):
    """Static gather indices/mask for one axis of the partially-folded
    head conv: input folded at factor ``g``, output folded at ``r``.

    For output phase ``ro`` (0..r-1) and HR tap offset ``dy``
    (-k//2..k//2), the HR source row is ``r*I + ro + dy = g*(gI*? )``…
    with stride ``r//g`` in the g-folded grid: source g-cell
    ``(r//g)*I + a`` at within-cell phase ``p`` where
    ``g*a + p = ro + dy``.  Returns (taps A, hr-tap index array
    (A, g, r), valid mask, (lo, hi) padding in g-cells).
    """
    half = k // 2
    e_min, e_max = -half, (r - 1) + half
    a_min = e_min // g          # floor
    a_max = e_max // g
    taps = a_max - a_min + 1
    a = np.arange(taps)[:, None, None] + a_min   # g-cell displacement
    p = np.arange(g)[None, :, None]              # input phase in cell
    ro = np.arange(r)[None, None, :]             # output phase
    idx = g * a + p - ro + half                  # HR tap index into k
    valid = (idx >= 0) & (idx < k)
    return taps, np.clip(idx, 0, k - 1), valid, (-a_min, a_max)


def partial_fold_kernel(
    w: jnp.ndarray, scale: int, in_fold: int
) -> tuple[jnp.ndarray, tuple, int]:
    """Repack an HR conv kernel (k, k, C, Co) for input that is only
    PARTIALLY unfolded: the input tensor is the pre-``depth_to_space``
    (factor ``in_fold``) feature map (channels ``(C, p, q)`` in torch
    PixelShuffle order), the output is fully folded at ``scale``.

    Returns the (A, A, C*in_fold^2, Co*scale^2) kernel, the asymmetric
    padding reproducing SAME-at-HR, and the conv stride
    (``scale // in_fold``).  Used to FUSE the ``depth_to_space`` of a
    subpixel upsample directly into the following head conv: the HR
    tensor is never materialized, which deletes two full-resolution
    relayout passes per step (d2s + the head's s2d).
    """
    k = w.shape[0]
    c_in, c_out = w.shape[2], w.shape[3]
    r, g = scale, in_fold
    if r % g:
        raise ValueError(f"scale {r} not divisible by in_fold {g}")
    taps, idx, valid, pad = _partial_fold_indices(k, r, g)

    w1 = jnp.take(w, jnp.asarray(idx.reshape(-1)), axis=0)
    w1 = w1.reshape(taps, g, r, k, c_in, c_out)
    w1 = w1 * jnp.asarray(valid.reshape(taps, g, r, 1, 1, 1), w.dtype)
    w2 = jnp.take(w1, jnp.asarray(idx.reshape(-1)), axis=3)
    w2 = w2.reshape(taps, g, r, taps, g, r, c_in, c_out)
    w2 = w2 * jnp.asarray(
        valid.reshape(1, 1, 1, taps, g, r, 1, 1), w.dtype
    )
    # axes: (ay, p, ro, ax, q, so, ci, co)
    #    -> (ay, ax, ci, p, q, co, ro, so): input channels (ci, p, q)
    #       match the pre-d2s producer; output channels (co, ro, so)
    #       match depth_to_space(scale).
    w2 = w2.transpose(0, 3, 6, 1, 4, 7, 2, 5)
    kernel = w2.reshape(taps, taps, c_in * g * g, c_out * r * r)
    return kernel, (pad, pad), r // g


def conv_head_partially_folded(
    y_folded: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    scale: int,
    in_fold: int,
) -> jnp.ndarray:
    """SAME HR conv applied directly to a pre-``depth_to_space`` tensor.

    ``y_folded`` is the producer conv's output BEFORE
    ``depth_to_space(in_fold)`` (e.g. the SRGAN upsample stage's
    (H/2, W/2, C*4) tensor); the result equals
    ``conv_subpixel_space(depth_to_space(y_folded, in_fold), w, b,
    scale)`` — identical math, no HR-resolution relayouts.
    """
    kernel, padding, stride = partial_fold_kernel(w, scale, in_fold)
    kernel = kernel.astype(y_folded.dtype)
    dn = jax.lax.conv_dimension_numbers(
        y_folded.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        y_folded, kernel, (stride, stride), padding,
        dimension_numbers=dn,
    )
    if b is not None:
        out = out + jnp.repeat(b, scale * scale).astype(out.dtype)
    return depth_to_space(out, scale)
