"""Ahead-of-time serving artifacts: StableHLO-exported generators.

Production serving wants a deployable artifact, not a Python model
definition: something a fleet can load and run without torchsr_tpu,
flax, or the checkpoint machinery on the serving path.  JAX's native
answer is `jax.export` — the jitted eval-mode generator forward is
lowered once to StableHLO (for TPU and CPU in the same artifact),
with the trained parameters baked in as constants, and serialized to
a single portable blob.  Any JAX process — a slim server, a different
Python version, a later jax release within the compatibility window —
deserializes and calls it; XLA compiles the StableHLO for whatever
platform it lands on.

The reference has no serving story (its test.py re-instantiates the
torch module and loads a .pth each time, test.py:22-63); this is the
TPU-native deployment path beyond that.

Design notes:

- **Static shapes.** A serving artifact fixes (batch, tile_h, tile_w)
  at export.  That is TPU-correct anyway (static shapes are what the
  compiler wants) and composes with `infer/tiled.py`: an artifact
  exported at the tile shape IS a valid `infer_fn` for
  `upscale_image`/`tiled_upscale`, so arbitrarily large frames run
  through the fixed-shape program.
- **Params are baked as constants.**  On the serving side there is no
  per-call re-upload (the repo's "params as jit arguments" rule is
  about the tunneled dev runtime's per-call constant re-materialization;
  a served executable holds its constants on-device).  The artifact is
  self-contained: weights travel inside it.
- **Sidecar metadata.**  A small JSON next to the blob records model,
  scale, shapes, and the export calling convention, so servers can
  validate inputs without parsing StableHLO.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

SIDECAR_SUFFIX = ".json"
_FORMAT_VERSION = 1


def export_generator_artifact(
    out_path: str,
    generator,
    variables: dict,
    *,
    input_hw: tuple[int, int],
    batch: int = 1,
    scale: int = 4,
    model: str = "",
    platforms: Sequence[str] = ("tpu", "cpu"),
    compute_dtype: str = "float32",
    native_kernels: bool = False,
) -> str:
    """Export ``generator``'s eval forward to ``out_path`` (+ sidecar).

    ``variables`` is the flax variable dict ({"params": ..., optional
    "batch_stats": ...}); its arrays are baked into the artifact.
    The exported callable maps ``(batch, H, W, 3) float32`` (pixels in
    [0, 1]) to ``(batch, H*scale, W*scale, 3) float32`` regardless of
    the generator's internal ``compute_dtype`` (recorded in the
    sidecar; a bfloat16 generator is the benchmarked TPU serving
    configuration, with float32 at the artifact boundary).

    Returns ``out_path``.
    """
    from jax import export as jax_export

    h, w = input_hw
    variables = jax.device_put(variables)

    @jax.jit
    def serve_fn(batch_imgs):
        out = generator.apply(variables, batch_imgs, train=False)
        # The artifact's calling convention is f32 in / f32 out even
        # when the baked generator computes in bfloat16.
        return jnp.asarray(out, jnp.float32)

    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    exported = jax_export.export(serve_fn, platforms=list(platforms))(
        spec
    )
    blob = exported.serialize()
    with open(out_path, "wb") as fh:
        fh.write(blob)
    meta = {
        "format_version": _FORMAT_VERSION,
        "model": model,
        "scale": int(scale),
        "input_shape": [int(batch), int(h), int(w), 3],
        "output_shape": [int(batch), int(h * scale), int(w * scale), 3],
        "dtype": "float32",
        "compute_dtype": compute_dtype,
        "pixel_range": [0.0, 1.0],
        "platforms": list(exported.platforms),
        "calling_convention": "sr = f(lr_batch)",
        # True when the graph embeds Mosaic (Pallas) custom-calls: the
        # artifact is TPU-only and bound to the Mosaic serialization
        # compatibility window, in exchange for the fused RDB kernel's
        # measured 1.5x tiled-serving throughput.
        "native_kernels": bool(native_kernels),
    }
    with open(out_path + SIDECAR_SUFFIX, "w") as fh:
        json.dump(meta, fh, indent=2)
    return out_path


class ServedGenerator:
    """A deserialized serving artifact, usable directly or as the
    ``infer_fn`` of the tiled/whole-image upscale helpers."""

    def __init__(self, path: str):
        from jax import export as jax_export

        with open(path, "rb") as fh:
            self.exported = jax_export.deserialize(fh.read())
        sidecar = path + SIDECAR_SUFFIX
        if os.path.exists(sidecar):
            self.meta = json.load(open(sidecar))
        else:
            # blob alone is still runnable; synthesize what we can
            self.meta = {
                "input_shape": list(self.exported.in_avals[0].shape),
                "scale": None,
                "model": "",
            }
        self.input_shape = tuple(self.meta["input_shape"])
        self.scale = self.meta.get("scale")
        platforms = self.meta.get("platforms")
        backend = jax.default_backend()
        if platforms and backend not in platforms:
            hint = (
                " (exported with --native-kernels: the Mosaic "
                "custom-calls only run on TPU hosts)"
                if self.meta.get("native_kernels")
                else ""
            )
            raise RuntimeError(
                f"serving artifact {path!r} was exported for "
                f"platform(s) {platforms} but this host's backend is "
                f"{backend!r}{hint}; re-export with --platforms "
                f"{backend} or serve on a matching host."
            )
        self._call = jax.jit(self.exported.call)

    def __call__(self, batch_imgs: jnp.ndarray) -> jnp.ndarray:
        return self._call(batch_imgs)

    def upscale_image(
        self,
        image: np.ndarray,
        overlap: int | None = None,
        quantize_u8: bool = False,
    ) -> np.ndarray:
        """Upscale an (H, W, 3) image of any size: a frame matching
        the export shape runs as one forward; anything else runs
        through overlap-blend tiling (which pads small frames and
        blends large ones) with this artifact as the tile forward.

        ``overlap`` defaults to 16 LR pixels, clamped below the tile
        size so the tiling stride stays positive.

        ``quantize_u8`` rounds to uint8 ON DEVICE before the host
        transfer — 4x less readback than the f32 frame (a 4K output is
        ~400 MB as f32, ~100 MB as uint8), which dominates request
        latency on PCIe-attached and (especially) tunneled runtimes.
        Use it whenever the consumer wants encoded pixels anyway.
        """
        from torchsr_tpu.infer.tiled import tiled_upscale

        b, th, tw, _c = self.input_shape
        scale = self.scale or 4
        arr = np.asarray(image)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        x = jnp.asarray(arr, jnp.float32)
        if b == 1 and x.shape[:2] == (th, tw):
            out = self(x[None])[0]
        else:
            if th != tw:
                raise ValueError(
                    f"tiled serving needs a square export shape, got "
                    f"{(th, tw)}"
                )
            if overlap is None:
                overlap = min(16, max(th // 4, 1))
            # clamp explicit values too: the tiling stride is
            # tile - overlap and must stay positive
            overlap = min(overlap, th - 1)
            out = tiled_upscale(
                self, x, scale=scale, tile=th, overlap=overlap,
                tile_batch=b,
            )
        out = jnp.clip(out, 0.0, 1.0)
        if quantize_u8:
            out = (out * 255.0 + 0.5).astype(jnp.uint8)
        return np.asarray(out)
