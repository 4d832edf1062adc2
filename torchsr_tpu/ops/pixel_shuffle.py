"""Sub-pixel (pixel shuffle) ops for NHWC tensors.

TPU-native replacement for the reference's ``nn.PixelShuffle``
(srgan/residual.py:16-48): a pure reshape+transpose that XLA fuses with the
producing convolution, i.e. ``depth_to_space``.

Channel ordering matches torch's PixelShuffle contract — input channel
index ``c * r^2 + i * r + j`` maps to output channel ``c`` at spatial
offset ``(i, j)`` — so weights converted from torch checkpoints behave
identically (see torchsr_tpu.models.torch_compat).
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_to_space(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Rearrange ``(..., H, W, C*r*r)`` to ``(..., H*r, W*r, C)``."""
    *b, h, w, c = x.shape
    r = factor
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by factor^2 {r * r}")
    c_out = c // (r * r)
    x = x.reshape(*b, h, w, c_out, r, r)
    # (..., h, w, c, i, j) -> (..., h, i, w, j, c)
    nb = len(b)
    perm = tuple(range(nb)) + (nb, nb + 3, nb + 1, nb + 4, nb + 2)
    x = x.transpose(perm)
    return x.reshape(*b, h * r, w * r, c_out)


def space_to_depth(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Inverse of :func:`depth_to_space`."""
    *b, h, w, c = x.shape
    r = factor
    if h % r != 0 or w % r != 0:
        raise ValueError(f"spatial dims ({h}, {w}) not divisible by {r}")
    x = x.reshape(*b, h // r, r, w // r, r, c)
    nb = len(b)
    # (..., h, i, w, j, c) -> (..., h, w, c, i, j)
    perm = tuple(range(nb)) + (nb, nb + 2, nb + 4, nb + 1, nb + 3)
    x = x.transpose(perm)
    return x.reshape(*b, h // r, w // r, c * r * r)
