"""Multi-chip tiled inference: tile batches sharded over the mesh.

Tiles are independent work units, so arbitrary-size-image inference
scales across a slice embarrassingly: the overlapping tile batch is
sharded on the mesh's 'data' axis and the generator forward runs inside
``shard_map`` — each chip executes the whole forward on its local tile
shard with NO collectives.  shard_map (rather than relying on sharding
propagation) is load-bearing for ESRGAN: XLA's SPMD partitioner has no
rule for the fused Pallas RDB custom call and would all-gather the tile
batch to every device and run the kernel replicated
(ops/pallas/rdb.py; measured 62 gathers on the 8-device test mesh).
Inside shard_map the kernel only ever sees the local batch, so pass the
generator WITHOUT its own ``mesh=`` here.  The sequential overlap-add
runs once on the gathered SR tiles.

This is the multi-chip face of BASELINE.md config 5; single-chip users
keep `infer.tiled.tiled_upscale`.  Validated on the virtual 8-device
CPU mesh against the single-device path — for both generators, ESRGAN
with the fused kernel active (tests/test_multichip_infer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from torchsr_tpu.infer.tiled import _blend_window, _positions
from torchsr_tpu.parallel.mesh import batch_sharding, replicate


def tiled_upscale_sharded(
    infer_fn,
    params,
    image,
    mesh,
    scale: int = 4,
    tile: int = 128,
    overlap: int = 16,
    tile_batch_per_device: int = 4,
) -> jnp.ndarray:
    """Upscale an (H, W, 3) float image with tiles sharded over ``mesh``.

    ``infer_fn(params, batch)`` must accept ``(B, tile, tile, 3)``;
    ``params`` should already be replicated on the mesh.
    """
    n_dev = int(mesh.devices.size)
    image = jnp.asarray(image, jnp.float32)
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

    group = n_dev * tile_batch_per_device
    n_padded = -(-n_tiles // group) * group
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

    # Stage 1 (sharded): gather tiles and run the generator with the
    # tile batch split over the mesh.
    image_r = replicate(image, mesh)
    shard = batch_sharding(mesh)
    ys_s = jax.device_put(ys_arr, shard)
    xs_s = jax.device_put(xs_arr, shard)
    sr_tiles = _sharded_forward(
        infer_fn, params, image_r, ys_s, xs_s, tile=tile, mesh=mesh
    )

    # Stage 2 (single program over gathered tiles): overlap-add.
    out = _overlap_add(
        sr_tiles, ys_arr, xs_arr, valid, window,
        canvas_hw=(ph * scale, pw * scale), scale=scale,
    )
    return out[: h * scale, : w * scale]


@functools.partial(jax.jit, static_argnames=("infer_fn", "tile", "mesh"))
def _sharded_forward(infer_fn, params, image, ys, xs, *, tile, mesh):
    def local(params, image, ys, xs):
        def grab(y, x):
            return jax.lax.dynamic_slice(
                image, (y, x, 0), (tile, tile, 3)
            )

        tiles = jax.vmap(grab)(ys, xs)
        return infer_fn(params, tiles)

    if mesh is None or mesh.devices.size <= 1:
        return local(params, image, ys, xs)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=P("data"),
        # Pallas custom-call outputs carry no varying-mesh-axes
        # annotation, which the vma checker requires.
        check_vma=False,
    )(params, image, ys, xs)


@functools.partial(jax.jit, static_argnames=("canvas_hw", "scale"))
def _overlap_add(sr_tiles, ys, xs, valid, window, *, canvas_hw, scale):
    t4 = sr_tiles.shape[1]
    acc = jnp.zeros((*canvas_hw, 3), jnp.float32)
    wacc = jnp.full((*canvas_hw, 1), 1e-8, jnp.float32)

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
