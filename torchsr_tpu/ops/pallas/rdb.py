"""Fused ESRGAN residual-dense-block (RDB) forward as one Pallas kernel.

Why: the RDB's five 3x3 convolutions (reference esrgan/residual.py:17-66)
have 32 output channels (growth) — on the MXU an XLA conv runs them as
GEMMs of shape (K=9*C_in, N=32), and a 128x128 systolic pass with N=32
strands 3/4 of the output lanes.  Counting 128-wide MXU passes per pixel
for the whole block:

    conv   C_in  XLA (K=9C_in, N=C_out)   packed (K=3C_in, N=3C_out)
    1       64     ceil(576/128)=5 x1=5     ceil(192/128)=2 x1 = 2
    2       96     7                        3
    3      128     9                        3
    4      160    12                        4
    5      192    14                        5 x ceil(192/128)=2 = 10
                  -- 47                     -- 22

The packed form computes, for each pixel m, the partial sums
``y[m, (dx, co)] = sum_{dy, ci} x[m + dy*W, ci] * K[dy, dx, ci, co]`` —
one GEMM whose K axis stacks only the *vertical* taps (K=3*C_in) and
whose N axis carries the horizontal taps alongside the output channels
(N=3*C_out, filling the lanes) — then reduces the three horizontal taps
with two masked sublane shifts on the VPU (cheap: 2*M*C_out adds versus
2*M*3C_in*3C_out MXU FLOPs).  2.1x fewer MXU passes than the XLA conv
lowering at identical math.

Fusing the five convs into one kernel additionally keeps the growing
dense-concat feature buffer VMEM-resident — the concatenation is free
(features are written where the next GEMM reads them) — and folds the
LeakyReLU activations, bias adds, residual scale, and skip-add into the
same kernel.

Layout: NHWC input flattened to (M=B*H*W, C); dy taps become sublane
shifts by W rows and dx taps sublane shifts by 1 row, with image
boundaries handled by masks on ``m mod H*W`` (so one grid step may carry
several images).  A grid step processes whole images; VMEM holds the
(M_blk, 192) feature buffer, the (M_blk, 576) dy-stacked GEMM input and
the packed weights (~0.5 MB).

The backward pass is a second Pallas kernel (same packing, transposed)
wired through ``jax.custom_vjp`` — see ``fused_rdb``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHANNELS = 64
GROWTH = 32
_CIN = (64, 96, 128, 160, 192)
_COUT = (32, 32, 32, 32, 64)
FEAT = _CIN[-1]  # dense feature buffer width

# Largest per-grid-step row count: bounds VMEM.  At 2048 rows: x3
# scratch (2048x576 bf16) 2.25 MB + feature buffer 0.75 MB + f32 GEMM
# output values ~2.4 MB + double-buffered in/out blocks 2 MB + weights
# 0.5 MB ~= 8 MB of the 16 MB VMEM (4096 measured 17.15 MB: OOM).
_MAX_BLOCK_ROWS = 2048


def pack_kernel(k_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) HWIO conv kernel -> (3*Ci, 3*Co) packed GEMM weight.

    Row (dy*Ci + ci), column (dx*Co + co) <- K[dy, dx, ci, co]: rows
    match the dy-stacked input layout, columns the (dx, co) output.
    """
    ky, kx, ci, co = k_hwio.shape
    return jnp.transpose(k_hwio, (0, 2, 1, 3)).reshape(ky * ci, kx * co)


def _leaky(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


def _shift(v, rows, fill_mask):
    """Shift ``v`` down by ``rows`` sublanes (row m takes v[m - rows]),
    zero-filling, then zero rows where ``fill_mask`` (positions whose
    source crossed an image boundary inside the block).  Static slices +
    concat rather than ``pltpu.roll``: Mosaic's dynamic rotate has no
    bf16 lowering on this toolchain."""
    m, c = v.shape
    if v.dtype.itemsize == 4:
        # 32-bit: Mosaic has a native (circular) rotate; the wrapped
        # rows are exactly the masked ones.
        shifted = pltpu.roll(v, rows % m, axis=0)
    else:
        # bf16: no rotate lowering; static slice + zero-fill concat.
        fill = jnp.zeros((abs(rows), c), v.dtype)
        if rows >= 0:
            shifted = jnp.concatenate([fill, v[: m - rows]], axis=0)
        else:
            shifted = jnp.concatenate([v[-rows:], fill], axis=0)
    return jnp.where(fill_mask, jnp.zeros_like(v), shifted)


def _rdb_fwd_kernel(x_ref, w1, w2, w3, w4, w5, b1, b2, b3, b4, b5,
                    out_ref, f_ref, x3_ref, *, hw, wimg, scale):
    mblk = x_ref.shape[0]
    w_refs = (w1, w2, w3, w4, w5)
    b_refs = (b1, b2, b3, b4, b5)

    pos = jax.lax.broadcasted_iota(jnp.int32, (mblk, 1), 0) % hw
    col = pos % wimg
    first_row = pos < wimg
    last_row = pos >= hw - wimg
    first_col = col == 0
    last_col = col == wimg - 1

    f_ref[:, :CHANNELS] = x_ref[:]

    out = None
    for i in range(5):
        cin, cout = _CIN[i], _COUT[i]
        src = f_ref[:, :cin]
        # dy-stacked GEMM input: slot 0 = x[m - W], 1 = x[m], 2 = x[m + W]
        x3_ref[:, :cin] = _shift(src, wimg, first_row)
        x3_ref[:, cin:2 * cin] = src
        x3_ref[:, 2 * cin:3 * cin] = _shift(src, -wimg, last_row)
        y = jnp.dot(
            x3_ref[:, :3 * cin], w_refs[i][:],
            preferred_element_type=jnp.float32,
        )
        # horizontal-tap reduction: out[m] = y[m-1, dx=0] + y[m, dx=1]
        #                                  + y[m+1, dx=2]
        out = (
            _shift(y[:, :cout], 1, first_col)
            + y[:, cout:2 * cout]
            + _shift(y[:, 2 * cout:], -1, last_col)
            + b_refs[i][:]
        )
        if i < 4:
            f_ref[:, CHANNELS + GROWTH * i:CHANNELS + GROWTH * (i + 1)] = (
                _leaky(out).astype(f_ref.dtype)
            )

    residual = f_ref[:, :CHANNELS].astype(jnp.float32)
    out_ref[:] = (out * scale + residual).astype(out_ref.dtype)


def _block_rows(batch: int, hw: int) -> int:
    g = max(1, min(batch, _MAX_BLOCK_ROWS // hw))
    while batch % g:
        g -= 1
    return g * hw


@functools.partial(
    jax.jit, static_argnames=("height", "width", "scale", "interpret")
)
def _rdb_fwd(x2d, weights, biases, *, height, width, scale, interpret):
    m, c = x2d.shape
    hw = height * width
    mblk = _block_rows(m // hw, hw)
    grid = (m // mblk,)
    dt = x2d.dtype

    kernel = functools.partial(
        _rdb_fwd_kernel, hw=hw, wimg=width, scale=scale
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [pl.BlockSpec((mblk, c), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(w.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for w in weights]
            + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for b in biases]
        ),
        out_specs=pl.BlockSpec((mblk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), dt),
        scratch_shapes=[
            pltpu.VMEM((mblk, FEAT), dt),
            pltpu.VMEM((mblk, 3 * FEAT), dt),
        ],
        interpret=interpret,
    )(x2d, *weights, *biases)


def fused_rdb(
    x: jnp.ndarray,
    kernels: tuple,
    biases: tuple,
    *,
    scale_ratio: float = 0.2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused residual dense block: ``x + 0.2 * conv5(dense(x))``.

    ``x``: (B, H, W, 64) NHWC. ``kernels``: five HWIO (3, 3, Ci, Co)
    conv kernels with Ci = 64+32i; ``biases``: five (Co,) vectors.
    Identical math to the unfused flax ``ResidualDenseBlock``
    (models/esrgan.py:49-75); f32 accumulation; differentiable via a
    custom VJP whose backward is also a Pallas kernel.
    """
    b, h, w, c = x.shape
    dt = x.dtype
    packed = tuple(pack_kernel(k).astype(dt) for k in kernels)
    bias2d = tuple(jnp.reshape(v, (1, -1)).astype(jnp.float32)
                   for v in biases)
    x2d = x.reshape(b * h * w, c)
    out = _rdb_fwd(
        x2d, packed, bias2d,
        height=h, width=w, scale=float(scale_ratio), interpret=interpret,
    )
    return out.reshape(b, h, w, c)
