"""Pixel-pair-packed 3x3 64->64 convolution as one Pallas kernel.

Why: 64-channel 3x3 convolutions — the SRGAN residual tower
(reference srgan/residual.py:51-92), both trunk convs, and ESRGAN's HR
tail convs (esrgan/generator.py:42-52) — run on the MXU as
(K=9*64=576, N=64) GEMMs under the XLA lowering: 5 K-tiles (the fifth
half-filled) times one HALF-filled N-tile, a measured ~45% of bf16 peak
(docs/benchmarks.md "87 TFLOP/s, 44%"; the pass model
ceil(K/128)*ceil(N/128)*M/8 predicts 576*64/(5*128*128) = 45%).

The pair packing fills the lanes with real data: each GEMM row carries
TWO horizontally-adjacent output pixels.  Row r of the packed layout
holds the 64 channels of pixels (2r, 2r+1); producing both outputs
needs the 3x4 input window (3 dy rows x pixels 2r-1..2r+2), which is
stacked into K as six 128-lane groups — per dy row, P = [x(2r-1) |
x(2r)] and Q = [x(2r+1) | x(2r+2)] — giving a (K=768, N=128) GEMM of
six FULL K-tiles and one FULL N-tile.  The packed weight is 75% dense
(each output pixel uses 3 of its row's 4 dx taps), so passes/pixel drop
from 5/8 to 6/16 = 1.67x fewer, with a ~75%-of-peak ceiling
(~148 TFLOP/s on v5e) versus the XLA lowering's 45%.

Layout: the kernel input is the image flattened to PAIR rows in
"u order": u[r] = [x(2r+1) channels | x(2r) channels] (odd pixel in
lanes 0:64 — this ordering lets both P and Q derive from u with pure
SUBLANE shifts, no lane rotate, for which Mosaic has no bf16 lowering
on this toolchain).  The 12 window slots are rebuilt per dy with one
sublane shift + a positional mask each; masks come from row iotas
(mod image extent), so multi-image blocks need no stripe stores.  The
output leaves in natural "E order" ([even | odd]), which reshapes back
to NHWC as a no-op view.

The backward pass is a second Pallas kernel wired through
``jax.custom_vjp``: dx is the same pair conv with the flipped/
transposed kernel; dW comes from six (128, M)x(M, 128) dots against
the saved input pairs (K = M rows — an efficient MXU contraction,
unlike XLA's lane-starved weight-grad convs), accumulated across the
sequential TPU grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64  # the only supported channel count (pairs fill 128 lanes)

# Per-grid-step pair-row budget for multi-image blocks (VMEM: ~5 MB of
# the default 16 MB scoped limit at 2048 bf16 rows).
_MAX_BLOCK_PAIR_ROWS = 2048
# A single image's pair rows cannot be split (the dy shifts need the
# whole image in one grid step); images up to this many pair rows run
# one-per-step with a raised scoped-VMEM limit.  16384 pair rows =
# a 128x256-class image (ESRGAN's 128px training HR convs fit).
_MAX_IMAGE_PAIR_ROWS = 16384
_BIG_BLOCK_VMEM = 64 * 1024 * 1024


def pack_pair_weights(k_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 64, 64) HWIO kernel -> (6, 128, 128) stacked pair-GEMM
    weights [P0, Q0, P1, Q1, P2, Q2] (P/Q per dy row).

    Row blocks follow u order ([odd-side | even-side] lanes); column
    blocks are [even output | odd output]:
      P[ky] = [[K(ky,0), 0      ],     rows 0:64  = pixel 2r-1
               [K(ky,1), K(ky,0)]]     rows 64:   = pixel 2r
      Q[ky] = [[K(ky,2), K(ky,1)],     rows 0:64  = pixel 2r+1
               [0,       K(ky,2)]]     rows 64:   = pixel 2r+2
    """
    z = jnp.zeros((C, C), k_hwio.dtype)
    mats = []
    for ky in range(3):
        k0, k1, k2 = (k_hwio[ky, kx] for kx in range(3))
        mats.append(jnp.block([[k0, z], [k1, k0]]))
        mats.append(jnp.block([[k2, k1], [z, k2]]))
    return jnp.stack(mats)


def _flip_transpose(k_hwio: jnp.ndarray) -> jnp.ndarray:
    """The data-gradient kernel: K'[ky, kx] = K[2-ky, 2-kx]^T."""
    return jnp.transpose(k_hwio[::-1, ::-1], (0, 1, 3, 2))


def _sshift(v, rows):
    """Shift ``v`` down by ``rows`` sublanes (row m takes v[m - rows]),
    zero-filling at the block edge.  Static slice + concat: Mosaic's
    dynamic rotate has no bf16 lowering on this toolchain."""
    if rows == 0:
        return v
    m, c = v.shape
    fill = jnp.zeros((abs(rows), c), v.dtype)
    if rows > 0:
        return jnp.concatenate([fill, v[: m - rows]], axis=0)
    return jnp.concatenate([v[-rows:], fill], axis=0)


def _window_slots(u, *, hwp, wp, mblk):
    """Yield the six masked GEMM operands (P_ky, Q_ky for ky=0..2) from
    the u-order pair buffer.  Masks are positional (iota mod image
    extent), so interior image boundaries in multi-image blocks are
    handled uniformly with block edges."""
    h = hwp // wp
    pos = jax.lax.broadcasted_iota(jnp.int32, (mblk, 1), 0) % hwp
    pcol = pos % wp
    prow = pos // wp
    lane_lo = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < 64

    # Pbase[r] = [x(2r-1) | x(2r)], Qbase[r] = [x(2r+1) | x(2r+2)]:
    # u's lanes 0:64 hold the odd pixel, so both are sublane shifts.
    pb = jnp.where(lane_lo, _sshift(u, 1), u)
    qb = jnp.where(lane_lo, u, _sshift(u, -1))
    left_edge = lane_lo & (pcol == 0)
    right_edge = (~lane_lo) & (pcol == wp - 1)

    for ky in range(3):
        dy = ky - 1
        if dy < 0:
            vert = prow == 0
        elif dy > 0:
            vert = prow == h - 1
        else:
            vert = jnp.zeros_like(prow, jnp.bool_)
        p = _sshift(pb, -dy * wp)
        p = jnp.where(vert | left_edge, jnp.zeros_like(p), p)
        yield p
        q = _sshift(qb, -dy * wp)
        q = jnp.where(vert | right_edge, jnp.zeros_like(q), q)
        yield q


def _fwd_kernel(u_ref, w_ref, b_ref, out_ref, *, hwp, wp):
    mblk = u_ref.shape[0]
    acc = b_ref[:].astype(jnp.float32) * jnp.ones(
        (mblk, 1), jnp.float32
    )
    for i, slot in enumerate(
        _window_slots(u_ref[:], hwp=hwp, wp=wp, mblk=mblk)
    ):
        acc = acc + jnp.dot(
            slot, w_ref[i], preferred_element_type=jnp.float32
        )
    out_ref[:] = acc.astype(out_ref.dtype)


def _bwd_kernel(u_ref, gu_ref, wt_ref, dx_ref, dw_ref, db_ref,
                *, hwp, wp):
    mblk = u_ref.shape[0]
    pid = pl.program_id(0)
    gu = gu_ref[:]

    # dx: the same pair conv applied to the cotangent with the
    # flipped/transposed kernel (the adjoint of a zero-padded conv).
    acc = jnp.zeros((mblk, 128), jnp.float32)
    for i, slot in enumerate(
        _window_slots(gu, hwp=hwp, wp=wp, mblk=mblk)
    ):
        acc = acc + jnp.dot(
            slot, wt_ref[i], preferred_element_type=jnp.float32
        )
    dx_ref[:] = acc.astype(dx_ref.dtype)

    # dW: slot^T @ gu per slot (K = block rows — full MXU tiles), plus
    # the bias row-sum; accumulated across the sequential grid.
    dws = []
    for slot in _window_slots(u_ref[:], hwp=hwp, wp=wp, mblk=mblk):
        dws.append(jax.lax.dot_general(
            slot, gu, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    dw = jnp.stack(dws)
    db = jnp.sum(gu.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(pid == 0)
    def _():
        dw_ref[:] = dw
        db_ref[:] = db

    @pl.when(pid > 0)
    def _():
        dw_ref[:] = dw_ref[:] + dw
        db_ref[:] = db_ref[:] + db


def _block_pair_rows(batch: int, hwp: int) -> int:
    g = max(1, min(batch, _MAX_BLOCK_PAIR_ROWS // hwp))
    while batch % g:
        g -= 1
    return g * hwp


def _compiler_params(mblk: int):
    if mblk <= _MAX_BLOCK_PAIR_ROWS:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_BIG_BLOCK_VMEM)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret")
)
def _pair_fwd(u2d, wpacked, bias2d, *, height, width, interpret):
    m = u2d.shape[0]
    wp = width // 2
    hwp = height * wp
    mblk = _block_pair_rows(m // hwp, hwp)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hwp=hwp, wp=wp),
        grid=(m // mblk,),
        in_specs=[
            pl.BlockSpec((mblk, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wpacked.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mblk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 128), u2d.dtype),
        compiler_params=_compiler_params(mblk),
        interpret=interpret,
    )(u2d, wpacked, bias2d)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "interpret")
)
def _pair_bwd(u2d, gu2d, wt_packed, *, height, width, interpret):
    m = u2d.shape[0]
    wp = width // 2
    hwp = height * wp
    mblk = _block_pair_rows(m // hwp, hwp)
    const3 = pl.BlockSpec(wt_packed.shape, lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, hwp=hwp, wp=wp),
        grid=(m // mblk,),
        in_specs=[
            pl.BlockSpec((mblk, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mblk, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const3,
        ],
        out_specs=(
            pl.BlockSpec((mblk, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, 128), u2d.dtype),
            jax.ShapeDtypeStruct((6, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ),
        compiler_params=_compiler_params(mblk),
        interpret=interpret,
    )(u2d, gu2d, wt_packed)
    return dx, dw, db


def _to_u_order(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC (B, H, W, 64) -> (B*H*W/2, 128) pair rows, odd pixel first."""
    b, h, w, c = x.shape
    pairs = x.reshape(b, h, w // 2, 2, c)[:, :, :, ::-1, :]
    return pairs.reshape(b * h * (w // 2), 2 * c)


def _from_e_order(y2d: jnp.ndarray, shape) -> jnp.ndarray:
    """(B*H*W/2, 128) E-order pair rows -> NHWC (a plain reshape)."""
    b, h, w, c = shape
    return y2d.reshape(b, h, w, c)


def _unpack_dw(dw6: jnp.ndarray) -> jnp.ndarray:
    """(6, 128, 128) slot gradients (against u-order cotangent columns:
    [odd | even]) -> (3, 3, 64, 64) HWIO kernel gradient.

    Each tap's gradient is the sum of its two surviving 64x64 blocks
    (the discarded blocks correspond to the packed weight's zeros)."""
    taps = []
    for ky in range(3):
        p, q = dw6[2 * ky], dw6[2 * ky + 1]
        g_even = lambda mat, r: mat[r * C:(r + 1) * C, C:2 * C]  # noqa: E731
        g_odd = lambda mat, r: mat[r * C:(r + 1) * C, 0:C]  # noqa: E731
        # K(ky,0): pixel 2r-1 -> even out; pixel 2r -> odd out.
        k0 = g_even(p, 0) + g_odd(p, 1)
        # K(ky,1): pixel 2r -> even out; pixel 2r+1 -> odd out.
        k1 = g_even(p, 1) + g_odd(q, 0)
        # K(ky,2): pixel 2r+1 -> even out; pixel 2r+2 -> odd out.
        k2 = g_even(q, 0) + g_odd(q, 1)
        taps.append(jnp.stack([k0, k1, k2]))
    return jnp.stack(taps)


def _primal(u2d, kernel, bias, shape, interpret):
    wpacked = pack_pair_weights(kernel).astype(u2d.dtype)
    bias2d = jnp.tile(bias.reshape(1, C), (1, 2)).astype(jnp.float32)
    y2d = _pair_fwd(
        u2d, wpacked, bias2d,
        height=shape[1], width=shape[2], interpret=interpret,
    )
    return _from_e_order(y2d, shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pair_conv_diff(x, kernel, bias, interpret):
    return _primal(_to_u_order(x), kernel, bias, x.shape, interpret)


def _pair_conv_fwd(x, kernel, bias, interpret):
    u2d = _to_u_order(x)
    return (
        _primal(u2d, kernel, bias, x.shape, interpret),
        (u2d, kernel, x.shape),
    )


def _pair_conv_bwd(interpret, residuals, g):
    u2d, kernel, xshape = residuals
    dt = u2d.dtype
    gu2d = _to_u_order(g.astype(dt))
    wt = pack_pair_weights(_flip_transpose(kernel)).astype(dt)
    dx2d, dw6, db2 = _pair_bwd(
        u2d, gu2d, wt,
        height=xshape[1], width=xshape[2], interpret=interpret,
    )
    dk = _unpack_dw(dw6).astype(kernel.dtype)
    # u-order columns are [odd | even]; the bias sees both equally.
    db = (db2[0, :C] + db2[0, C:]).astype(jnp.float32)
    return _from_e_order(dx2d, xshape), dk, db


_pair_conv_diff.defvjp(_pair_conv_fwd, _pair_conv_bwd)


def pair_conv_supported(shape, kernel_shape=(3, 3, C, C)) -> bool:
    """Shape gate for the pair kernel: 3x3 64->64 stride-1, even width,
    and a per-image spatial extent inside the VMEM block budget."""
    if tuple(kernel_shape) != (3, 3, C, C):
        return False
    b, h, w, c = shape
    return (
        c == C
        and w % 2 == 0
        and h * (w // 2) <= _MAX_IMAGE_PAIR_ROWS
    )


def pair_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    interpret: bool = False,
    mesh=None,
    batch_axis: str = "data",
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, 64 -> 64 channels, NHWC, differentiable.

    Identical math to ``lax.conv_general_dilated`` with symmetric (1,1)
    padding (the reference's nn.Conv2d(64, 64, 3, padding=1)); f32
    accumulation; bias optional.

    ``mesh``: pass the training Mesh on multi-device runs — XLA's SPMD
    partitioner has no rule for a Pallas custom call and would
    all-gather the batch and run the kernel replicated (see
    ops/pallas/rdb.py).  With ``mesh`` the call runs inside shard_map
    over ``batch_axis``.
    """
    if not pair_conv_supported(x.shape, kernel.shape):
        raise ValueError(
            f"pair_conv: unsupported shapes x={x.shape} "
            f"kernel={kernel.shape}"
        )
    if bias is None:
        bias = jnp.zeros((C,), jnp.float32)
    if (
        mesh is not None
        and mesh.devices.size > 1
        and x.shape[0] % mesh.devices.size == 0
    ):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local(x, kernel, bias):
            return _pair_conv_diff(x, kernel, bias, bool(interpret))

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(batch_axis), P(), P()),
            out_specs=P(batch_axis),
            check_vma=False,
        )(x, kernel, bias)
    return _pair_conv_diff(x, kernel, bias, bool(interpret))


def conv_reference(x, kernel, bias=None):
    """The XLA lowering of the same conv (test/bench baseline)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
