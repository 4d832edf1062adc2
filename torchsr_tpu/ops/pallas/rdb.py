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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHANNELS = 64
GROWTH = 32
_CIN = (64, 96, 128, 160, 192)
_COUT = (32, 32, 32, 32, 64)
FEAT = _CIN[-1]  # dense feature buffer width

# Preferred per-grid-step row count: bounds VMEM.  At 2048 rows: x3
# scratch (2048x576 bf16) 2.25 MB + feature buffer 0.75 MB + f32 GEMM
# output values ~2.4 MB + double-buffered in/out blocks 2 MB + weights
# 0.5 MB ~= 8 MB of the default 16 MB scoped-VMEM limit.
_MAX_BLOCK_ROWS = 2048
# A single image larger than the preferred block cannot be split (the
# dy shifts need the whole image in one grid step), so up to this many
# rows the kernel runs with one image per step and a raised scoped-VMEM
# limit (v5e has 128 MB physical VMEM).  4096 rows = a 64x64 LR tile.
_MAX_IMAGE_ROWS = 4096
# Forward-only (inference) row cap: without the backward kernel's
# bigger working set, a single-image block fits VMEM up to a 128x128
# LR tile (16384 rows ~ 66 MB: 18.9 MB dy scratch + ~19 MB live f32
# GEMP outputs + 8.4 MB double-buffered in/out + weights) under the
# top _VMEM_TIERS limit.  Eligibility uses this cap only on
# non-differentiated forwards (models/esrgan.py threads the
# generator's train flag down as ``fwd_only``); training keeps
# _MAX_IMAGE_ROWS so the backward never sees blocks it cannot fit.
_MAX_IMAGE_ROWS_FWD = 16384
_VMEM_TIERS = (
    (4096, 64 * 1024 * 1024),
    # 16384-row blocks: the compiler schedules against the limit
    # (reported scoped use was limit+3.8 MB at 100 MB, limit+1.8 at
    # 110) — 120 MB converges inside v5e's 128 MB physical VMEM.
    (_MAX_IMAGE_ROWS_FWD, 120 * 1024 * 1024),
)
_BIG_BLOCK_VMEM = 64 * 1024 * 1024


def pack_kernel(k_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) HWIO conv kernel -> (3*Ci, 3*Co) packed GEMM weight.

    Row (dy*Ci + ci), column (dx*Co + co) <- K[dy, dx, ci, co]: rows
    match the dy-stacked input layout, columns the (dx, co) output.
    """
    ky, kx, ci, co = k_hwio.shape
    return jnp.transpose(k_hwio, (0, 2, 1, 3)).reshape(ky * ci, kx * co)


def unpack_kernel(packed: jnp.ndarray, ci: int, co: int) -> jnp.ndarray:
    """Inverse of :func:`pack_kernel`: (3*Ci, 3*Co) -> (3, 3, Ci, Co)."""
    return jnp.transpose(
        packed.reshape(3, ci, 3, co), (0, 2, 1, 3)
    )


def pack_kernel_t(k_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> the TRANSPOSED packed weight (3*Co, 3*Ci):
    row (dx*Co + co), column (dy*Ci + ci) — the backward GEMM operand."""
    ky, kx, ci, co = k_hwio.shape
    return jnp.transpose(k_hwio, (1, 3, 0, 2)).reshape(kx * co, ky * ci)


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


# dy slots inside the stacked feature buffer, padded to a 128-lane
# multiple so GEMM operand slices start lane-aligned.
_SLOT = 256


def _rdb_fwd_kernel(x_ref, w1, w2, w3, w4, w5, b1, b2, b3, b4, b5,
                    *refs, hw, wimg, scale, save_feat):
    """The feature buffer x3 keeps THREE dy-shifted copies of the dense
    features (slots: [0:192) = x[m-W], [256:448) = x[m], [512:704) =
    x[m+W]).  Each conv then only appends its 32 new channels to the
    three slots — the dy stacking is built incrementally instead of
    recopied per conv, which cuts the VPU copy traffic ~3x versus
    re-stacking (K=3C_in) buffers.  The GEMM splits into three
    K=C_in passes (one per slot), accumulated in f32."""
    if save_feat:
        out_ref, feat_ref, x3_ref = refs
    else:
        (out_ref, x3_ref), feat_ref = refs, None
    mblk = x_ref.shape[0]
    n_img = mblk // hw
    w_refs = (w1, w2, w3, w4, w5)
    b_refs = (b1, b2, b3, b4, b5)

    col = jax.lax.broadcasted_iota(jnp.int32, (mblk, 1), 0) % wimg
    first_col = col == 0
    last_col = col == wimg - 1

    def grow(v, off, c):
        """Append channels [off, off+c) to the three dy slots.  The
        shift's zero-fill covers the block's outer boundaries; interior
        image boundaries (multi-image blocks) are zeroed with static
        stripe stores."""
        x3_ref[:, _SLOT + off:_SLOT + off + c] = v
        up = jnp.concatenate(
            [jnp.zeros((wimg, c), v.dtype), v[:mblk - wimg]], axis=0
        )
        x3_ref[:, off:off + c] = up
        dn = jnp.concatenate(
            [v[wimg:], jnp.zeros((wimg, c), v.dtype)], axis=0
        )
        x3_ref[:, 2 * _SLOT + off:2 * _SLOT + off + c] = dn
        zero = jnp.zeros((wimg, c), v.dtype)
        for g in range(1, n_img):
            x3_ref[g * hw:g * hw + wimg, off:off + c] = zero
            x3_ref[g * hw - wimg:g * hw,
                   2 * _SLOT + off:2 * _SLOT + off + c] = zero

    grow(x_ref[:], 0, CHANNELS)

    out = None
    for i in range(5):
        cin, cout = _CIN[i], _COUT[i]
        w = w_refs[i]
        y = (
            jnp.dot(x3_ref[:, :cin], w[:cin],
                    preferred_element_type=jnp.float32)
            + jnp.dot(x3_ref[:, _SLOT:_SLOT + cin], w[cin:2 * cin],
                      preferred_element_type=jnp.float32)
            + jnp.dot(x3_ref[:, 2 * _SLOT:2 * _SLOT + cin],
                      w[2 * cin:3 * cin],
                      preferred_element_type=jnp.float32)
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
            grow(_leaky(out).astype(x3_ref.dtype),
                 CHANNELS + GROWTH * i, GROWTH)

    residual = x3_ref[:, _SLOT:_SLOT + CHANNELS].astype(jnp.float32)
    out_ref[:] = (out * scale + residual).astype(out_ref.dtype)
    if save_feat:
        feat_ref[:] = x3_ref[:, _SLOT:_SLOT + FEAT]


# Chunk-interleaved layout (forward-only serving kernel): per-32-channel
# chunk stride in the feature buffer is 3*32 = 96 lanes, holding that
# chunk's [up | mid | dn] dy copies contiguously.
_ILV_STRIDE = 3 * GROWTH


def _rdb_fwd_kernel_ilv(x_ref, w1, w2, w3, w4, w5, b1, b2, b3, b4, b5,
                        out_ref, x3_ref, *, hw, wimg, scale):
    """Chunk-interleaved variant of :func:`_rdb_fwd_kernel` (forward
    only — the serving/eval path; round-2 measured fwd -4%, rejected
    then because its BACKWARD paid +55% in lane-offset relayouts;
    round 5 re-lands it gated to never-differentiated forwards where
    no backward exists, per the roadmap note).

    The feature buffer interleaves the three dy copies per 32-channel
    chunk — chunk ``j`` occupies lanes [96j, 96j+96) as
    [up_j | mid_j | dn_j] — so every conv's GEMM operand is ONE
    contiguous lane-offset-0 slice ``buf[:, :3*C_in]`` and the matmul
    runs as a single K=3*C_in dot (the packed weight rows are ordered
    (chunk, dy, ci); :func:`_repack_ilv`).  Same store traffic as the
    3-slot kernel, one dot instead of three per conv."""
    mblk = x_ref.shape[0]
    n_img = mblk // hw
    w_refs = (w1, w2, w3, w4, w5)
    b_refs = (b1, b2, b3, b4, b5)

    col = jax.lax.broadcasted_iota(jnp.int32, (mblk, 1), 0) % wimg
    first_col = col == 0
    last_col = col == wimg - 1

    def grow(v, chunk0, c):
        """Write ``v``'s channels as chunks ``chunk0..`` ([up|mid|dn]
        per chunk).  Shift zero-fill covers the block's outer dy
        boundary; interior image boundaries get static stripe stores.
        The dy shifts are built at full width FIRST (operands at lane
        offset 0) and sliced per chunk only at the stores: Mosaic has
        no lowering for concat whose operand is a lane-offset slice
        ("offset mismatch on non-concat dimension")."""
        zero_c = jnp.zeros((wimg, c), v.dtype)
        up = jnp.concatenate([zero_c, v[:mblk - wimg]], axis=0)
        dn = jnp.concatenate([v[wimg:], zero_c], axis=0)
        zero = jnp.zeros((wimg, GROWTH), v.dtype)
        for j in range(c // GROWTH):
            base = (chunk0 + j) * _ILV_STRIDE
            sl = slice(j * GROWTH, (j + 1) * GROWTH)
            x3_ref[:, base + GROWTH:base + 2 * GROWTH] = v[:, sl]
            x3_ref[:, base:base + GROWTH] = up[:, sl]
            x3_ref[:, base + 2 * GROWTH:base + 3 * GROWTH] = dn[:, sl]
            for g in range(1, n_img):
                x3_ref[g * hw:g * hw + wimg, base:base + GROWTH] = zero
                x3_ref[g * hw - wimg:g * hw,
                       base + 2 * GROWTH:base + 3 * GROWTH] = zero

    grow(x_ref[:], 0, CHANNELS)

    out = None
    for i in range(5):
        cin, cout = _CIN[i], _COUT[i]
        y = jnp.dot(x3_ref[:, :3 * cin], w_refs[i][:],
                    preferred_element_type=jnp.float32)
        out = (
            _shift(y[:, :cout], 1, first_col)
            + y[:, cout:2 * cout]
            + _shift(y[:, 2 * cout:], -1, last_col)
            + b_refs[i][:]
        )
        if i < 4:
            grow(_leaky(out).astype(x3_ref.dtype),
                 (CHANNELS + GROWTH * i) // GROWTH, GROWTH)

    residual = x_ref[:].astype(jnp.float32)
    out_ref[:] = (out * scale + residual).astype(out_ref.dtype)


def _repack_ilv(w, ci):
    """Standard packed weight (rows (dy, ci)) -> chunk-interleaved rows
    (chunk, dy, ci-within-chunk); columns (dx, co) unchanged."""
    r, c3 = w.shape
    t = w.reshape(3, ci // GROWTH, GROWTH, c3)
    return jnp.transpose(t, (1, 0, 2, 3)).reshape(r, c3)


def _rdb_fwd_kernel_ext(x_ref, w1, w2, w3, w4, w5, b1, b2, b3, b4, b5,
                        *refs, hw, wimg, scale, save_feat):
    """Single-image extended-row variant of :func:`_rdb_fwd_kernel`.

    Instead of THREE dy-shifted slot copies (each conv output written
    three times, two of them via shift-constructed temporaries), the
    dense features live ONCE in a row-extended buffer of shape
    (hw + 2*W, 256): buffer row ``r`` holds the features of pixel
    ``m = r - W``, and the three dy GEMM operands are *static row-offset
    slices* of the same storage —

        up     = buf[0    : hw]        (features of m - W)
        center = buf[W    : W + hw]    (features of m)
        down   = buf[2W   : 2W + hw]   (features of m + W)

    The W head and tail rows are zeroed once before the conv loop (the
    image's outer dy boundary), so each conv appends its 32 channels
    with ONE store — ~3x less VPU copy traffic than the slot builds
    (A/B: tools/bench_rdb.py).  Requires one image per grid step (no
    interior image boundaries inside the buffer) and a row offset W
    that is a multiple of the 8-row sublane tile; ``_rdb_fwd`` gates on
    both and falls back to the 3-slot kernel otherwise.
    """
    if save_feat:
        out_ref, feat_ref, buf_ref = refs
    else:
        (out_ref, buf_ref), feat_ref = refs, None
    w_refs = (w1, w2, w3, w4, w5)
    b_refs = (b1, b2, b3, b4, b5)

    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % wimg
    first_col = col == 0
    last_col = col == wimg - 1

    # Outer dy boundary: zero the W-row head and tail once.
    zero = jnp.zeros((wimg, FEAT), buf_ref.dtype)
    buf_ref[:wimg, :FEAT] = zero
    buf_ref[wimg + hw:, :FEAT] = zero

    buf_ref[wimg:wimg + hw, :CHANNELS] = x_ref[:]

    out = None
    for i in range(5):
        cin, cout = _CIN[i], _COUT[i]
        w = w_refs[i]
        y = (
            jnp.dot(buf_ref[:hw, :cin], w[:cin],
                    preferred_element_type=jnp.float32)
            + jnp.dot(buf_ref[wimg:wimg + hw, :cin], w[cin:2 * cin],
                      preferred_element_type=jnp.float32)
            + jnp.dot(buf_ref[2 * wimg:2 * wimg + hw, :cin],
                      w[2 * cin:3 * cin],
                      preferred_element_type=jnp.float32)
        )
        out = (
            _shift(y[:, :cout], 1, first_col)
            + y[:, cout:2 * cout]
            + _shift(y[:, 2 * cout:], -1, last_col)
            + b_refs[i][:]
        )
        if i < 4:
            off = CHANNELS + GROWTH * i
            buf_ref[wimg:wimg + hw, off:off + GROWTH] = (
                _leaky(out).astype(buf_ref.dtype)
            )

    residual = buf_ref[wimg:wimg + hw, :CHANNELS].astype(jnp.float32)
    out_ref[:] = (out * scale + residual).astype(out_ref.dtype)
    if save_feat:
        feat_ref[:] = buf_ref[wimg:wimg + hw, :FEAT]


# Kernel-variant switch: the extended-row buffer kernels
# (_rdb_fwd_kernel_ext / _rdb_bwd_kernel_ext) are a MEASURED NEGATIVE
# and default OFF.  The hypothesis was that replacing the three
# dy-shifted slot stores (and the backward's shift+mask accumulation)
# with one row-extended buffer would cut VPU copy traffic; the
# order-swapped sequential A/B at the training shape (16,32,32,64)
# bf16 measured the ext layout ~8-10% SLOWER on both passes
# (fwd 183-207 vs 167-183 us/RDB, fwd+bwd 395-396 vs 359-373) and at
# parity at the 64px inference tile shape (310 both).  The extended
# buffer's GEMM operands live at row offsets (W, 2W) instead of 0 —
# Mosaic pays a sublane-offset relayout per dot that costs as much as
# the slot stores it saved.  Kept for re-evaluation on future
# toolchains: TORCHSR_RDB_EXT=1 enables it (env-driven, read once at
# import, because `_rdb_fwd`'s jit cache does not key on it — A/B runs
# use separate processes).
EXT_KERNEL = os.environ.get("TORCHSR_RDB_EXT", "0") == "1"

# Chunk-interleaved FORWARD kernel for never-differentiated calls
# (inference/serving/eval — `_rdb_fwd(save_feat=False)` outside the
# custom-VJP fwd rule).  Round-2 history: fwd -4% but bwd +55%, so it
# lost for training; the round-4 fwd-only gating (models/esrgan.py
# fwd_only) created a path where no backward ever runs, which this
# layout was re-landed to serve (round 5).  MEASURED NEGATIVE at the
# serving shape, default OFF: the order-swapped end-to-end A/B at the
# production tiled-inference config (tile 64 / overlap 8 / batch 16,
# single-image 4096-row blocks) read the interleaved kernel ~1%
# SLOWER (17.56/17.49 vs 17.69/17.70 MP/s) — the round-2 "-4% fwd"
# was measured on multi-image 2048-row training-shape blocks, and the
# one-dot-per-conv win does not survive the serving regime's raised-
# VMEM single-image blocks.  Kept selectable (TORCHSR_RDB_ILV=1) for
# future-toolchain re-evaluation; env-driven, read once at import —
# the jit cache does not key on it; A/B runs use separate processes.
ILV_KERNEL = os.environ.get("TORCHSR_RDB_ILV", "0") == "1"


def _ext_eligible(hw: int, width: int) -> bool:
    """The extended-row kernel needs one image per grid step (buffer has
    a single pad region) with the image small enough for VMEM, and GEMM
    operand row offsets (width, 2*width) on the 8/16-row sublane tile
    for both f32 and bf16."""
    return EXT_KERNEL and hw <= _MAX_IMAGE_ROWS and width % 16 == 0


def _compiler_params(mblk: int, itemsize: int, limit_bytes_above: int):
    """Raise the scoped-VMEM limit for blocks larger than what the
    16 MB default fits.  The trigger is in BYTES of block rows so f32
    blocks raise at half the row count of bf16 ones (an f32 eval-path
    block measured 17.5 MB at 2048 rows where bf16 fit).  Tiered: the
    forward-only 128px-tile blocks (16384 rows) need ~66 MB, above the
    64 MB that covers every fwd+bwd-eligible block."""
    if mblk * itemsize <= limit_bytes_above:
        return None
    for rows, limit in _VMEM_TIERS:
        if mblk <= rows:
            return pltpu.CompilerParams(vmem_limit_bytes=limit)
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_TIERS[-1][1])


def _block_rows(batch: int, hw: int, cap: int = _MAX_BLOCK_ROWS) -> int:
    g = max(1, min(batch, cap // hw))
    while batch % g:
        g -= 1
    return g * hw


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "scale", "interpret", "save_feat"),
)
def _rdb_fwd(x2d, weights, biases, *, height, width, scale, interpret,
             save_feat=False):
    m, c = x2d.shape
    hw = height * width
    ext = _ext_eligible(hw, width)
    ilv = ILV_KERNEL and not save_feat and not ext
    mblk = hw if ext else _block_rows(m // hw, hw)
    grid = (m // mblk,)
    dt = x2d.dtype

    if ilv:
        weights = tuple(
            _repack_ilv(w, _CIN[i]) for i, w in enumerate(weights)
        )
        kernel = functools.partial(
            _rdb_fwd_kernel_ilv, hw=hw, wimg=width, scale=scale,
        )
    else:
        kernel = functools.partial(
            _rdb_fwd_kernel_ext if ext else _rdb_fwd_kernel,
            hw=hw, wimg=width, scale=scale, save_feat=save_feat,
        )
    out_shape = jax.ShapeDtypeStruct((m, c), dt)
    out_specs = pl.BlockSpec((mblk, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    if save_feat:
        out_shape = (out_shape, jax.ShapeDtypeStruct((m, FEAT), dt))
        out_specs = (out_specs,
                     pl.BlockSpec((mblk, FEAT), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((mblk + 2 * width, _SLOT), dt) if ext
            else pltpu.VMEM(
                (mblk, 3 * FEAT if ilv else 3 * _SLOT), dt
            ),
        ],
        compiler_params=_compiler_params(mblk, x2d.dtype.itemsize,
                                         2 * _MAX_BLOCK_ROWS),
        interpret=interpret,
    )(x2d, *weights, *biases)


def _rdb_bwd_kernel(g_ref, feat_ref, t1, t2, t3, t4, t5,
                    dx_ref, dw1, dw2, dw3, dw4, dw5,
                    db1, db2, db3, db4, db5,
                    x3_ref, df_ref, *, hw, wimg, scale):
    """Backward of the fused RDB.  Inputs: the output cotangent ``g``
    and the forward's saved dense feature buffer (192 ch, post-
    activation — the LeakyReLU derivative is recovered from its sign).
    The dy-stacked slots are rebuilt with shifts (cheap), then each conv
    is reversed: dy <- dx-untranspose of da, dW <- x3_slot^T @ dy
    (K = M rows: an efficient MXU contraction), dF <- dy @ W^T
    unshifted into the dense-gradient accumulator.  dW/db outputs map
    every grid step onto the same block and accumulate across steps
    (the TPU grid is sequential)."""
    mblk = g_ref.shape[0]
    n_img = mblk // hw
    pid = pl.program_id(0)
    t_refs = (t1, t2, t3, t4, t5)
    dw_refs = (dw1, dw2, dw3, dw4, dw5)
    db_refs = (db1, db2, db3, db4, db5)

    pos = jax.lax.broadcasted_iota(jnp.int32, (mblk, 1), 0) % hw
    col = pos % wimg
    first_row = pos < wimg
    last_row = pos >= hw - wimg
    first_col = col == 0
    last_col = col == wimg - 1

    feat = feat_ref[:]
    x3_ref[:, _SLOT:_SLOT + FEAT] = feat
    x3_ref[:, :FEAT] = jnp.concatenate(
        [jnp.zeros((wimg, FEAT), feat.dtype), feat[:mblk - wimg]], axis=0
    )
    x3_ref[:, 2 * _SLOT:2 * _SLOT + FEAT] = jnp.concatenate(
        [feat[wimg:], jnp.zeros((wimg, FEAT), feat.dtype)], axis=0
    )
    zero = jnp.zeros((wimg, FEAT), feat.dtype)
    for gi in range(1, n_img):
        x3_ref[gi * hw:gi * hw + wimg, :FEAT] = zero
        x3_ref[gi * hw - wimg:gi * hw,
               2 * _SLOT:2 * _SLOT + FEAT] = zero

    df_ref[:] = jnp.zeros(df_ref.shape, df_ref.dtype)

    g = g_ref[:].astype(jnp.float32)
    da = g * scale
    dws, dbs = [None] * 5, [None] * 5
    for i in reversed(range(5)):
        cin, cout = _CIN[i], _COUT[i]
        dbs[i] = jnp.sum(da, axis=0, keepdims=True)
        # transpose of the dx reduction: dy_l[m] = da[m+1] (valid unless
        # m is a row's last col), dy_r[m] = da[m-1] (unless first col)
        dy = jnp.concatenate([
            _shift(da, -1, last_col), da, _shift(da, 1, first_col),
        ], axis=1).astype(x3_ref.dtype)
        dw_parts = []
        for s in range(3):
            xs = x3_ref[:, s * _SLOT:s * _SLOT + cin]
            dw_parts.append(jax.lax.dot_general(
                xs, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dws[i] = jnp.concatenate(dw_parts, axis=0)  # (3cin, 3cout)
        dx3 = jnp.dot(dy, t_refs[i][:], preferred_element_type=jnp.float32)
        # transpose of the dy slot builds (up was shift +W mask
        # first_row; dn was shift -W mask last_row)
        contrib = (
            _shift(dx3[:, :cin], -wimg, last_row)
            + dx3[:, cin:2 * cin]
            + _shift(dx3[:, 2 * cin:], wimg, first_row)
        )
        df_ref[:, :cin] = df_ref[:, :cin] + contrib
        if i > 0:
            lo = CHANNELS + GROWTH * (i - 1)
            act = feat[:, lo:lo + GROWTH]
            # LeakyReLU'(a) = 1 if a > 0 else 0.2, recovered from the
            # post-activation sign; arithmetic instead of a
            # scalar-branch select (Mosaic i1-relayout limitation).
            da = df_ref[:, lo:lo + GROWTH] * (
                0.2 + 0.8 * (act.astype(jnp.float32) > 0.0).astype(
                    jnp.float32)
            )

    dx_ref[:] = (df_ref[:, :CHANNELS] + g).astype(dx_ref.dtype)

    @pl.when(pid == 0)
    def _():
        for ref, val in zip(dw_refs, dws):
            ref[:] = val
        for ref, val in zip(db_refs, dbs):
            ref[:] = val

    @pl.when(pid > 0)
    def _():
        for ref, val in zip(dw_refs, dws):
            ref[:] = ref[:] + val
        for ref, val in zip(db_refs, dbs):
            ref[:] = ref[:] + val


def _rdb_bwd_kernel_ext(g_ref, feat_ref, t1, t2, t3, t4, t5,
                        dx_ref, dw1, dw2, dw3, dw4, dw5,
                        db1, db2, db3, db4, db5,
                        bbuf_ref, df_ref, *, hw, wimg, scale):
    """Extended-row variant of :func:`_rdb_bwd_kernel` (the backward
    analogue of ``_rdb_fwd_kernel_ext``; same eligibility gate).

    The saved dense features are written ONCE into a (hw + 2W, 256)
    row-extended buffer (row r = pixel r - W, W-row zero pads at both
    ends) instead of three dy-shifted slot copies, and the dW GEMM's
    three slot operands become static row-offset slices.  The dense-
    gradient accumulator gets the same extension: the three parts of
    ``dx3 = dy @ W^T`` accumulate at row offsets 0 / W / 2W with NO
    shifts or boundary masks — out-of-image contributions land in the
    pad rows and are simply never read back.  Removes two full-width
    concat-copies at slot build plus two shift+mask passes per conv."""
    pid = pl.program_id(0)
    t_refs = (t1, t2, t3, t4, t5)
    dw_refs = (dw1, dw2, dw3, dw4, dw5)
    db_refs = (db1, db2, db3, db4, db5)

    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % wimg
    first_col = col == 0
    last_col = col == wimg - 1

    feat = feat_ref[:]
    zero = jnp.zeros((wimg, FEAT), feat.dtype)
    bbuf_ref[:wimg, :FEAT] = zero
    bbuf_ref[wimg + hw:, :FEAT] = zero
    bbuf_ref[wimg:wimg + hw, :FEAT] = feat

    df_ref[:] = jnp.zeros(df_ref.shape, df_ref.dtype)

    g = g_ref[:].astype(jnp.float32)
    da = g * scale
    dws, dbs = [None] * 5, [None] * 5
    for i in reversed(range(5)):
        cin, cout = _CIN[i], _COUT[i]
        dbs[i] = jnp.sum(da, axis=0, keepdims=True)
        dy = jnp.concatenate([
            _shift(da, -1, last_col), da, _shift(da, 1, first_col),
        ], axis=1).astype(bbuf_ref.dtype)
        dw_parts = []
        for s in range(3):
            xs = bbuf_ref[s * wimg:s * wimg + hw, :cin]
            dw_parts.append(jax.lax.dot_general(
                xs, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        dws[i] = jnp.concatenate(dw_parts, axis=0)  # (3cin, 3cout)
        dx3 = jnp.dot(dy, t_refs[i][:], preferred_element_type=jnp.float32)
        df_ref[:hw, :cin] = df_ref[:hw, :cin] + dx3[:, :cin]
        df_ref[wimg:wimg + hw, :cin] = (
            df_ref[wimg:wimg + hw, :cin] + dx3[:, cin:2 * cin]
        )
        df_ref[2 * wimg:2 * wimg + hw, :cin] = (
            df_ref[2 * wimg:2 * wimg + hw, :cin] + dx3[:, 2 * cin:]
        )
        if i > 0:
            lo = CHANNELS + GROWTH * (i - 1)
            act = feat[:, lo:lo + GROWTH]
            da = df_ref[wimg:wimg + hw, lo:lo + GROWTH] * (
                0.2 + 0.8 * (act.astype(jnp.float32) > 0.0).astype(
                    jnp.float32)
            )

    dx_ref[:] = (df_ref[wimg:wimg + hw, :CHANNELS] + g).astype(dx_ref.dtype)

    @pl.when(pid == 0)
    def _():
        for ref, val in zip(dw_refs, dws):
            ref[:] = val
        for ref, val in zip(db_refs, dbs):
            ref[:] = val

    @pl.when(pid > 0)
    def _():
        for ref, val in zip(dw_refs, dws):
            ref[:] = ref[:] + val
        for ref, val in zip(db_refs, dbs):
            ref[:] = ref[:] + val


# Backward holds an extra f32 dense-gradient buffer and (rows, 576) f32
# GEMM outputs; 2048-row blocks need the raised VMEM limit and measure
# ~8% faster than 1024 (390 vs 424 us/RDB fwd+bwd).
_MAX_BLOCK_ROWS_BWD = 2048


@functools.partial(
    jax.jit, static_argnames=("height", "width", "scale", "interpret")
)
def _rdb_bwd(g2d, feat2d, weights_t, *, height, width, scale, interpret):
    m, c = g2d.shape
    hw = height * width
    ext = _ext_eligible(hw, width)
    mblk = hw if ext else _block_rows(m // hw, hw, cap=_MAX_BLOCK_ROWS_BWD)
    grid = (m // mblk,)
    dt = g2d.dtype

    kernel = functools.partial(
        _rdb_bwd_kernel_ext if ext else _rdb_bwd_kernel,
        hw=hw, wimg=width, scale=scale,
    )
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM,
    )
    out_shape = (
        [jax.ShapeDtypeStruct((m, c), dt)]
        + [jax.ShapeDtypeStruct((3 * _CIN[i], 3 * _COUT[i]), jnp.float32)
           for i in range(5)]
        + [jax.ShapeDtypeStruct((1, _COUT[i]), jnp.float32)
           for i in range(5)]
    )
    out_specs = (
        [pl.BlockSpec((mblk, c), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [const((3 * _CIN[i], 3 * _COUT[i])) for i in range(5)]
        + [const((1, _COUT[i])) for i in range(5)]
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [pl.BlockSpec((mblk, c), lambda i: (i, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((mblk, FEAT), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)]
            + [const(w.shape) for w in weights_t]
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((mblk + 2 * width, _SLOT), dt) if ext
            else pltpu.VMEM((mblk, 3 * _SLOT), dt),
            pltpu.VMEM((mblk + 2 * width, FEAT), jnp.float32) if ext
            else pltpu.VMEM((mblk, FEAT), jnp.float32),
        ],
        # bf16 at the full 2048-row backward block already measures
        # 16.9 MB: raise the limit for anything past 1024 bf16-rows.
        compiler_params=_compiler_params(mblk, g2d.dtype.itemsize,
                                         _MAX_BLOCK_ROWS_BWD),
        interpret=interpret,
    )(g2d, feat2d, *weights_t)
    return res[0], tuple(res[1:6]), tuple(res[6:11])


# Backward-backend switch: "pallas" runs the fused Pallas backward
# kernel (_rdb_bwd_kernel); "xla" expresses the SAME backward math in
# XLA conv primitives from the Pallas forward's saved feature buffer
# (hybrid: Pallas fwd + XLA bwd).  Round-3 on-TPU A/B REJECTED the
# hybrid: fwd+bwd 521.6 us/RDB vs 356.1 for the pure Pallas backward
# (pure XLA 384.1) — standalone conv_general_dilated dW/dx calls lose
# the fusion context XLA builds around its own forward, and the
# saved-buffer slicing adds relayout traffic (docs/roadmap.md).  The
# default stays "pallas"; this knob remains a gradient-debugging
# backend.  Env-driven, read once at import (the jit caches do not
# key on it; A/B runs use separate processes, see tools/bench_rdb).
BWD_XLA = os.environ.get("TORCHSR_RDB_BWD", "pallas") == "xla"


def _rdb_bwd_xla(g, feat, kernels, scale):
    """RDB backward in XLA conv primitives from the saved buffer.

    ``g``: (B, H, W, 64) output cotangent; ``feat``: the Pallas
    forward's saved post-activation dense feature buffer
    (B*H*W, 192) — x | y1..y4, the same residual the Pallas backward
    kernel consumes (the LeakyReLU derivative is recovered from the
    post-activation sign).  Each conv is reversed in XLA's native
    backward lowerings: d-input via ``jax.vjp`` of a plain
    ``lax.conv_general_dilated`` at its saved input slice (bf16
    operands under AMP, like the forward GEMMs), and d-weight via an
    explicit batch-contracted conv with ``preferred_element_type=f32``
    so weight gradients accumulate in f32 like the Pallas backward's
    (a bf16 vjp would round each dW — a B*H*W-term reduction — through
    bf16)."""
    b, h, w, c = g.shape
    feat4 = feat.reshape(b, h, w, FEAT)
    dt = feat4.dtype  # the compute dtype (bf16 under AMP, like the
    # forward GEMMs and the Pallas backward's operands)
    g32 = g.astype(jnp.float32)
    dfeat = jnp.zeros((b, h, w, FEAT), jnp.float32)
    da = g32 * scale  # d(conv5 pre-bias output); conv5 has no activation
    dks, dbs = [None] * 5, [None] * 5

    def conv(cat, k):
        return jax.lax.conv_general_dilated(
            cat, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for i in reversed(range(5)):
        cin = _CIN[i]
        cat = feat4[..., :cin]
        k = kernels[i].astype(dt)
        dy = da.astype(dt)
        dbs[i] = jnp.sum(da, axis=(0, 1, 2))
        _, vjp = jax.vjp(lambda c: conv(c, k), cat)
        (dcat,) = vjp(dy)
        # dW as a batch-contracted conv (lhs batch<->feature roles
        # swapped; output (kh, kw, Ci, Co)): bf16 operands, f32
        # accumulation.
        dks[i] = jax.lax.conv_general_dilated(
            cat, dy, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("CHWN", "IHWO", "HWNC"),
            preferred_element_type=jnp.float32,
        )
        dfeat = dfeat.at[..., :cin].add(dcat.astype(jnp.float32))
        if i > 0:
            lo = CHANNELS + GROWTH * (i - 1)
            act = feat4[..., lo:lo + GROWTH]
            # LeakyReLU'(z) from the post-activation sign; same
            # convention as the Pallas backward kernel.
            da = dfeat[..., lo:lo + GROWTH] * (
                0.2 + 0.8 * (act.astype(jnp.float32) > 0.0).astype(
                    jnp.float32)
            )

    dx = (dfeat[..., :CHANNELS] + g32).astype(g.dtype)
    dks = tuple(
        dk.astype(kernels[i].dtype) for i, dk in enumerate(dks)
    )
    return dx, dks, tuple(dbs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_rdb_diff(x, kernels, biases, scale_ratio, interpret):
    # Primal (non-differentiated) path: do NOT emit the feature-buffer
    # residual output — inference/eval would pay its HBM write (and the
    # f32 eval path its VMEM) for nothing.  The fwd RULE below runs the
    # save_feat variant only under differentiation.
    b, h, w, c = x.shape
    dt = x.dtype
    packed = tuple(pack_kernel(k).astype(dt) for k in kernels)
    bias2d = tuple(jnp.reshape(v, (1, -1)).astype(jnp.float32)
                   for v in biases)
    out = _rdb_fwd(
        x.reshape(b * h * w, c), packed, bias2d,
        height=h, width=w, scale=scale_ratio, interpret=interpret,
        save_feat=False,
    )
    return out.reshape(b, h, w, c)


def _fused_rdb_fwd(x, kernels, biases, scale_ratio, interpret):
    b, h, w, c = x.shape
    dt = x.dtype
    packed = tuple(pack_kernel(k).astype(dt) for k in kernels)
    bias2d = tuple(jnp.reshape(v, (1, -1)).astype(jnp.float32)
                   for v in biases)
    out, feat = _rdb_fwd(
        x.reshape(b * h * w, c), packed, bias2d,
        height=h, width=w, scale=scale_ratio, interpret=interpret,
        save_feat=True,
    )
    return out.reshape(b, h, w, c), (feat, kernels)


def _fused_rdb_bwd(scale_ratio, interpret, residuals, g):
    feat, kernels = residuals
    if BWD_XLA:
        return _rdb_bwd_xla(g, feat, kernels, scale_ratio)
    b, h, w, c = g.shape
    dt = feat.dtype
    weights_t = tuple(pack_kernel_t(k).astype(dt) for k in kernels)
    dx2d, dws, dbs = _rdb_bwd(
        g.reshape(b * h * w, c).astype(dt), feat, weights_t,
        height=h, width=w, scale=scale_ratio, interpret=interpret,
    )
    dks = tuple(
        unpack_kernel(dw, _CIN[i], _COUT[i]).astype(kernels[i].dtype)
        for i, dw in enumerate(dws)
    )
    dbs = tuple(db.reshape(-1) for db in dbs)
    return dx2d.reshape(b, h, w, c), dks, dbs


_fused_rdb_diff.defvjp(_fused_rdb_fwd, _fused_rdb_bwd)


def fused_rdb(
    x: jnp.ndarray,
    kernels: tuple,
    biases: tuple,
    *,
    scale_ratio: float = 0.2,
    interpret: bool = False,
    mesh=None,
    batch_axis: str = "data",
) -> jnp.ndarray:
    """Fused residual dense block: ``x + 0.2 * conv5(dense(x))``.

    ``x``: (B, H, W, 64) NHWC. ``kernels``: five HWIO (3, 3, Ci, Co)
    conv kernels with Ci = 64+32i; ``biases``: five (Co,) vectors.
    Identical math to the unfused flax ``ResidualDenseBlock``
    (models/esrgan.py:49-75); f32 accumulation; differentiable — the
    backward pass is a second Pallas kernel (``_rdb_bwd_kernel``) wired
    through ``jax.custom_vjp``, with the post-activation dense feature
    buffer as the saved residual.

    ``mesh``: pass the training ``Mesh`` on multi-device runs.  XLA's
    SPMD partitioner has no rule for a Pallas custom call, so under
    plain sharding propagation it ALL-GATHERS the batch to every device
    and runs the kernel replicated (measured: 62 gathers on the 8-dev
    test mesh).  With ``mesh`` the call runs inside ``shard_map`` over
    ``batch_axis``: each chip runs the kernel on its local batch shard
    and the custom-VJP transposes to a psum for the replicated weight
    gradients — the data-parallel semantics the rest of the trainer
    gets from propagation.
    """
    kernels, biases = tuple(kernels), tuple(biases)
    if (
        mesh is not None
        and mesh.devices.size > 1
        and x.shape[0] % mesh.devices.size == 0
    ):
        # (indivisible batches — e.g. the batch-1 progress render —
        # fall through to the plain call: replicated, correct, and rare)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local(x, kernels, biases):
            return _fused_rdb_diff(
                x, kernels, biases, float(scale_ratio), bool(interpret)
            )

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(batch_axis), P(), P()),
            out_specs=P(batch_axis),
            # pallas_call's ShapeDtypeStruct outputs carry no varying-
            # mesh-axes annotation, which the vma checker requires.
            check_vma=False,
        )(x, kernels, biases)
    return _fused_rdb_diff(
        x, kernels, biases, float(scale_ratio), bool(interpret)
    )
