"""Tiled overlap-blend inference for arbitrary-size images.

The reference upscales the whole image in one forward pass
(test.py:57-62), which OOMs on large inputs and recompiles per size
under XLA.  This module is the TPU-native answer (the spatial analogue
of context-parallel blockwise processing, SURVEY.md section 5): the image
is covered by fixed-size overlapping tiles, the generator runs over the
tiles *batched* (one compiled executable regardless of image size), and
the SR tiles are blended back with a separable linear ramp over the halo
so tile seams are invisible.

Everything after decode happens on device inside one jitted function per
(H, W, tile, overlap) signature:
  * tile extraction: a vmapped ``dynamic_slice`` (a gather)
  * generator: ``lax.map`` over fixed-size tile chunks -> full MXU
    utilization at a static shape
  * overlap-add: a ``lax.scan`` of read-modify-write dynamic slices on
    the output canvas, followed by one divide by the accumulated weight.

A monolithic == tiled equivalence test lives in tests/test_tiled.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# LR tile sizes measured fastest per model on v5e (docs/benchmarks.md:
# ESRGAN 64px tiles beat 128px 1.53x with the fused Pallas RDB kernel
# active; SRGAN prefers the largest swept tile — the round-5 frame
# anatomy shows the SRGAN frame is tower-compute-bound at an MXU shape
# ceiling, so halo redundancy is the attackable term and 256px tiles
# cut it 1.343x -> 1.264x on a 1080p frame: 115.1 -> 119.6 MP/s at
# identical overlap/seam quality, tools/profile_infer.py --sweep).
DEFAULT_SERVING_TILE = {"esrgan": 64, "srgan": 256}


def _positions(size: int, tile: int, stride: int) -> list[int]:
    """Start offsets covering [0, size) with final tile clamped flush."""
    if size <= tile:
        return [0]
    pos = list(range(0, size - tile + 1, stride))
    if pos[-1] != size - tile:
        pos.append(size - tile)
    return pos


@functools.lru_cache(maxsize=32)
def _blend_window(size: int, ramp: int) -> np.ndarray:
    """Separable 2-D blending window: linear ramp over ``ramp`` pixels."""
    i = np.arange(size, dtype=np.float32)
    if ramp <= 0:
        w = np.ones(size, np.float32)
    else:
        w = np.minimum.reduce(
            [np.ones(size, np.float32), (i + 1) / ramp, (size - i) / ramp]
        )
        # Quadratic ramp: near-zero weight for the outermost tile pixels
        # (where conv padding makes the tile output wrong) while tiles
        # flush with the global image border still normalize exactly.
        w = np.maximum(w, 1e-4) ** 2
    return np.outer(w, w)[:, :, None]


def tiled_upscale(
    infer_fn,
    image: jnp.ndarray,
    scale: int = 4,
    tile: int = 128,
    overlap: int = 16,
    tile_batch: int = 8,
    params=None,
) -> jnp.ndarray:
    """Upscale an ``(H, W, 3)`` float image by ``scale`` with tiling.

    ``infer_fn(batch) -> batch*scale`` (or ``infer_fn(params, batch)``
    when ``params`` is given) must accept ``(B, tile, tile, 3)``.
    Returns ``(H*scale, W*scale, 3)`` float32.

    Pass model parameters via ``params`` rather than closing over them
    in ``infer_fn``: closure-captured device arrays become compiled-in
    constants, which some runtimes re-materialize per call (measured
    ~300x slower on a tunneled TPU).
    """
    if not 0 <= overlap < tile:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < tile, got "
            f"overlap={overlap} tile={tile} (the tiling stride is "
            f"tile - overlap and must stay positive)"
        )
    h, w = image.shape[:2]
    pad_h = max(tile - h, 0)
    pad_w = max(tile - w, 0)
    if pad_h or pad_w:
        image = jnp.pad(
            image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect"
        )
    ph, pw = image.shape[:2]
    stride = tile - overlap
    ys = _positions(ph, tile, stride)
    xs = _positions(pw, tile, stride)
    grid = [(y, x) for y in ys for x in xs]
    n_tiles = len(grid)

    # Pad the tile list to a multiple of tile_batch (extra tiles recompute
    # position (0, 0); their contribution is discarded by weight zeroing).
    n_padded = -(-n_tiles // tile_batch) * tile_batch
    ys_arr = jnp.asarray(
        [g[0] for g in grid] + [0] * (n_padded - n_tiles), jnp.int32
    )
    xs_arr = jnp.asarray(
        [g[1] for g in grid] + [0] * (n_padded - n_tiles), jnp.int32
    )
    valid = jnp.asarray(
        [1.0] * n_tiles + [0.0] * (n_padded - n_tiles), jnp.float32
    )
    window = jnp.asarray(_blend_window(tile * scale, overlap * scale))

    out = _tiled_core(
        infer_fn, params, image, ys_arr, xs_arr, valid, window,
        tile=tile, scale=scale, tile_batch=tile_batch,
    )
    return out[: h * scale, : w * scale]


@functools.partial(
    jax.jit,
    static_argnames=("infer_fn", "tile", "scale", "tile_batch"),
)
def _tiled_core(
    infer_fn, params, image, ys, xs, valid, window,
    *, tile, scale, tile_batch,
):
    ph, pw = image.shape[:2]
    t4 = tile * scale

    def grab(y, x):
        return jax.lax.dynamic_slice(image, (y, x, 0), (tile, tile, 3))

    tiles = jax.vmap(grab)(ys, xs)  # (N, tile, tile, 3)

    chunks = tiles.reshape(-1, tile_batch, tile, tile, 3)
    if params is None:
        sr_chunks = jax.lax.map(infer_fn, chunks)
    else:
        sr_chunks = jax.lax.map(
            lambda c: infer_fn(params, c), chunks
        )
    sr_tiles = sr_chunks.reshape(-1, t4, t4, 3)

    acc = jnp.zeros((ph * scale, pw * scale, 3), jnp.float32)
    wacc = jnp.full((ph * scale, pw * scale, 1), 1e-8, jnp.float32)

    def body(carry, inp):
        acc, wacc = carry
        sr_tile, y, x, v = inp
        wtile = window * v
        y4, x4 = y * scale, x * scale
        patch = jax.lax.dynamic_slice(acc, (y4, x4, 0), (t4, t4, 3))
        acc = jax.lax.dynamic_update_slice(
            acc, patch + sr_tile * wtile, (y4, x4, 0)
        )
        wpatch = jax.lax.dynamic_slice(wacc, (y4, x4, 0), (t4, t4, 1))
        wacc = jax.lax.dynamic_update_slice(
            wacc, wpatch + wtile, (y4, x4, 0)
        )
        return (acc, wacc), None

    (acc, wacc), _ = jax.lax.scan(
        body, (acc, wacc), (sr_tiles, ys, xs, valid)
    )
    return acc / wacc


def upscale_image(
    infer_fn,
    image: np.ndarray,
    scale: int = 4,
    tile: int = 0,
    overlap: int = 16,
    tile_batch: int = 8,
    params=None,
) -> np.ndarray:
    """Upscale an HxWx3 uint8/float image; ``tile=0`` = single forward.

    ``tile=0`` reproduces the reference's monolithic whole-image forward
    (test.py:62); any positive tile size switches to overlap-blend
    tiling for bounded memory and size-independent compilation.
    See :func:`tiled_upscale` for the ``params`` contract.
    """
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    x = jnp.asarray(arr, jnp.float32)
    if tile and (x.shape[0] > tile or x.shape[1] > tile):
        out = tiled_upscale(
            infer_fn, x, scale=scale, tile=tile,
            overlap=overlap, tile_batch=tile_batch, params=params,
        )
    elif params is None:
        out = infer_fn(x[None])[0]
    else:
        out = infer_fn(params, x[None])[0]
    return np.asarray(jnp.clip(out, 0.0, 1.0))
