"""Pallas TPU kernel: fused LR/HR training-pair synthesis.

One kernel pass per image does what the XLA path
(torchsr_tpu.data.preprocess.synthesize_pair) expresses as several ops:
uint8 -> float normalize, horizontal/vertical flips, and the two-pass
PIL-compatible bicubic downscale (W then H) with uint8 quantization
between passes — entirely in VMEM, emitting both the HR float crop and
the LR pair with no HBM round-trips for intermediates.

Grid: one program per batch element.  The resample matrices are
precomputed on the host (torchsr_tpu.ops.resize.resample_matrix) and
broadcast to every program.  Flips are implemented by reversing the
relevant axis with a static `lax.rev` and selecting per-sample — both
branches are computed; the select is free on the VPU and keeps the
kernel shape-static.

The matmuls contract over the crop's spatial axes with
``preferred_element_type=float32`` so they land on the MXU.

This kernel exists as the `use_pallas=True` path of
``synthesize_pair``; the XLA path remains the default (XLA already
fuses this well — the kernel is measured, not assumed, to be at least
at parity; see tools/bench_preprocess.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchsr_tpu.ops.resize import resample_matrix


def _quant(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


def _pair_kernel(crops_ref, flips_ref, mat_ref, hr_ref, lr_ref):
    """One batch element: (S, S, 3) uint8 -> HR (S,S,3) + LR (s,s,3)."""
    hr = crops_ref[0].astype(jnp.float32) / 255.0  # (S, S, 3)

    hflip = flips_ref[0, 0] != 0
    vflip = flips_ref[0, 1] != 0
    hr = jnp.where(hflip, jax.lax.rev(hr, (1,)), hr)
    hr = jnp.where(vflip, jax.lax.rev(hr, (0,)), hr)
    hr_ref[0] = hr

    size = hr.shape[0]
    lr_size = mat_ref.shape[0]
    mat = mat_ref[...]  # (s, S)

    # Pass 1 (width): contract W. (S, S, 3) x (s, S) -> (S, s, 3)
    x = jax.lax.dot_general(
        hr, mat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, 3, s) -> axes: (h, c, o)
    x = _quant(x)
    # Pass 2 (height): contract H. x is (S, c, s); (s, S) x -> (s, c, s)
    y = jax.lax.dot_general(
        mat, x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (s_h, c, s_w)
    y = _quant(y)
    lr_ref[0] = jnp.transpose(y, (0, 2, 1))  # (s, s, 3)

    del size, lr_size


@functools.partial(
    jax.jit, static_argnames=("upscale_factor", "interpret")
)
def synthesize_pair_pallas(
    crops_u8: jnp.ndarray,
    flips: jnp.ndarray,
    upscale_factor: int = 4,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-fused equivalent of data.preprocess.synthesize_pair."""
    b, size = crops_u8.shape[0], crops_u8.shape[1]
    lr_size = size // upscale_factor
    mat = jnp.asarray(resample_matrix(size, lr_size))
    flips_i = flips.astype(jnp.int32)

    hr, lr = pl.pallas_call(
        _pair_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, size, size, 3), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (lr_size, size), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, size, size, 3), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, lr_size, lr_size, 3), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, lr_size, lr_size, 3), jnp.float32),
        ),
        interpret=interpret,
    )(crops_u8, flips_i, mat)
    return lr, hr
