"""The ``test`` subcommand: load a trained generator, upscale one image.

Capability parity with the reference's inference path (test.py:22-63)
with its two latent bugs fixed (SURVEY.md section 3.2):
  * works whether or not the checkpoint was saved with a DDP ``module.``
    prefix (the reference NameErrors on non-DDP checkpoints);
  * output name is ``upres-{basename}`` so input paths containing
    directories don't break the save.

Accepts both our ``.ckpt`` checkpoints and reference ``.pth`` files, and
upgrades the monolithic whole-image forward with optional tiled
overlap-blend inference (``--tile``) for arbitrarily large inputs.
"""

from __future__ import annotations

import os
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np

from torchsr_tpu.infer.tiled import upscale_image
from torchsr_tpu.utils import image_io
from torchsr_tpu.utils.checkpoint import find_checkpoint, load_checkpoint


def resolve_compute_dtype(args: Namespace):
    """Inference compute dtype: bfloat16 on TPU unless ``--disable-amp``,
    float32 everywhere else.

    bf16 is the configuration every published inference number was
    measured in (docs/benchmarks.md) and matches the training-time eval
    forward; its rounding (rel. eps 2^-8) sits at the same order as the
    uint8 output quantization step.  CPU XLA emulates bf16 matmuls, so
    off-TPU the default stays f32."""
    if getattr(args, "disable_amp", False):
        return jnp.float32
    return (
        jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    )


def load_trained_generator(
    args: Namespace, generator_cls, **generator_kwargs
):
    """Resolve the checkpoint, size the generator to it, and return
    ``(generator, variables)`` — shared by ``test`` and ``export``.
    Extra kwargs flow to the generator constructor."""
    model = args.model.lower()
    ckpt_path = getattr(args, "checkpoint", None) or find_checkpoint(
        f"{model}-gan-best.ckpt"
    )
    if ckpt_path is None:
        raise FileNotFoundError(
            f"no checkpoint found (looked for {model}-gan-best.ckpt / "
            f".pth in the working directory); train a model first or "
            f"pass --checkpoint"
        )
    checkpoint = load_checkpoint(ckpt_path, model)
    state = checkpoint["state"]
    params = state.get("params", state)
    batch_stats = state.get("batch_stats", {})

    # Size the generator to the checkpoint: block count from the
    # block{i} entries, upscale factor from the upsample stages (each
    # stage is 2x: SRGAN upsample{i} subpixel convs, ESRGAN
    # upsample{i} nearest+conv) — so `torchsr train --scale 2|8`
    # checkpoints load everywhere with no extra flag.
    num_blocks = len([k for k in params if str(k).startswith("block")])
    n_up = len([k for k in params if str(k).startswith("upsample")])
    scale = 2 ** n_up if n_up else 4
    if model == "esrgan":
        generator = generator_cls(
            num_rrdb_blocks=num_blocks or 23, scale_factor=scale,
            **generator_kwargs
        )
    else:
        generator = generator_cls(
            num_residual=num_blocks or 16, scale_factor=scale,
            **generator_kwargs
        )

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return generator, jax.device_put(variables)


def run_test(args: Namespace, generator_cls) -> str:
    """Upscale ``args.image`` with the best GAN checkpoint.

    ``args.image`` may also be a DIRECTORY: every supported image in it
    is upscaled to ``upres-{name}``, reusing one loaded generator and
    (with ``--tile``) one compiled fixed-shape executable across the
    whole batch — the reference re-launches and re-loads per image.
    Returns the output path (single image) or the output directory.
    """
    # Params are threaded as a jit ARGUMENT (not a closure capture):
    # captured device arrays compile in as constants, which some
    # runtimes re-materialize per call (measured ~300x slower through
    # a tunneled TPU).
    generator, variables = load_trained_generator(
        args, generator_cls, dtype=resolve_compute_dtype(args)
    )

    def infer_fn(v, batch: jnp.ndarray) -> jnp.ndarray:
        return generator.apply(v, batch, train=False)

    infer_jit = jax.jit(infer_fn)

    if getattr(args, "shard_tiles", False):
        from torchsr_tpu.infer.tiled import DEFAULT_SERVING_TILE
        from torchsr_tpu.parallel.mesh import make_mesh, replicate

        shard_mesh = make_mesh(getattr(args, "num_devices", None))
        variables_r = replicate(variables, shard_mesh)
        shard_tile = getattr(args, "tile", 0) or DEFAULT_SERVING_TILE.get(
            args.model.lower(), 64
        )

    def upscale_one(path: str) -> np.ndarray:
        image = image_io.load_image(path)
        if getattr(args, "shard_tiles", False):
            from torchsr_tpu.infer.multichip import tiled_upscale_sharded

            n_dev = int(shard_mesh.devices.size)
            sr = tiled_upscale_sharded(
                infer_fn,
                variables_r,
                jnp.asarray(image, jnp.float32) / 255.0,
                shard_mesh,
                scale=generator.scale_factor,
                tile=shard_tile,
                overlap=min(
                    getattr(args, "tile_overlap", 16), shard_tile - 1
                ),
                tile_batch_per_device=max(
                    1, getattr(args, "tile_batch", 8) // n_dev
                ),
            )
            return np.asarray(jnp.clip(sr, 0.0, 1.0))
        if getattr(args, "spatial_shard", False):
            from torchsr_tpu.infer.halo import (
                halo_upscale,
                make_spatial_mesh,
            )

            sr = halo_upscale(
                infer_fn,
                variables,
                jnp.asarray(image, jnp.float32) / 255.0,
                make_spatial_mesh(),
                scale=generator.scale_factor,
                overlap=getattr(args, "tile_overlap", 16),
            )
            return np.asarray(jnp.clip(sr, 0.0, 1.0))
        return np.asarray(upscale_image(
            infer_jit,
            image,
            scale=generator.scale_factor,
            tile=getattr(args, "tile", 0) or 0,
            overlap=getattr(args, "tile_overlap", 16),
            tile_batch=getattr(args, "tile_batch", 8),
            params=variables,
        ))

    if os.path.isdir(args.image):
        from torchsr_tpu.data.discovery import discover_images

        paths = discover_images(args.image)
        if not paths:
            raise ValueError(
                f"no supported images found in directory {args.image}"
            )
        for path in paths:
            out_path = f"upres-{os.path.basename(path)}"
            image_io.save_image(upscale_one(path), out_path)
        return f"{len(paths)} images -> upres-* in {os.getcwd()}"

    out_path = f"upres-{os.path.basename(args.image)}"
    image_io.save_image(upscale_one(args.image), out_path)
    return out_path


def run_export(args: Namespace, generator_cls) -> str:
    """The ``export`` subcommand: write a StableHLO serving artifact."""
    from torchsr_tpu.infer.serving import export_generator_artifact

    # Serving artifacts default to pure StableHLO: the fused Pallas
    # RDB kernel embeds Mosaic custom-calls whose serialization is
    # bound to the Mosaic compatibility window, so portable ESRGAN
    # exports pin the XLA lowering (identical math).  ``--native-
    # kernels`` opts into baking the fused kernel for a TPU-only
    # artifact — the measured 1.5x tiled-serving win (docs/benchmarks.md
    # "HTTP serving latency": 17.7 vs 11.8 MP/s checkpoint-vs-artifact
    # was exactly this lowering gap).
    tile = getattr(args, "tile", 64)
    native = getattr(args, "native_kernels", False)
    if native:
        if args.model.lower() != "esrgan":
            raise ValueError(
                "--native-kernels bakes the fused Pallas RDB kernel, "
                "which only the ESRGAN generator uses; export "
                f"{args.model} without it (the XLA lowering is already "
                "its fastest form)."
            )
        from torchsr_tpu.ops.pallas.rdb import _MAX_IMAGE_ROWS_FWD

        if tile * tile > _MAX_IMAGE_ROWS_FWD:
            raise ValueError(
                f"--native-kernels supports tiles up to "
                f"{int(_MAX_IMAGE_ROWS_FWD ** 0.5)}px (the fused "
                f"kernel's forward-only VMEM block budget); got "
                f"--tile {tile}. Export a smaller tile or drop "
                f"--native-kernels."
            )
        if jax.default_backend() != "tpu":
            raise RuntimeError(
                "--native-kernels requires exporting on a TPU host: "
                "the Mosaic kernel lowering dispatches on the host "
                f"backend (currently {jax.default_backend()!r})."
            )
    kwargs = (
        {"fused_rdb": native} if args.model.lower() == "esrgan" else {}
    )
    # --bf16 bakes the benchmarked TPU serving precision into the
    # artifact's compute graph; the artifact boundary stays float32
    # (serving.py casts the output and records compute_dtype in the
    # sidecar).
    bf16 = getattr(args, "bf16", False)
    if bf16:
        kwargs["dtype"] = jnp.bfloat16
    generator, variables = load_trained_generator(
        args, generator_cls, **kwargs
    )
    platforms = tuple(
        p.strip() for p in getattr(args, "platforms", "tpu,cpu").split(",")
        if p.strip()
    )
    if native and platforms != ("tpu",):
        # Mosaic custom-calls only lower for TPU; restrict rather than
        # fail — the default --platforms includes cpu for portability.
        platforms = ("tpu",)
    return export_generator_artifact(
        args.output, generator, variables,
        input_hw=(tile, tile),
        batch=getattr(args, "tile_batch", 8),
        scale=generator.scale_factor,
        model=args.model.lower(),
        platforms=platforms,
        compute_dtype="bfloat16" if bf16 else "float32",
        native_kernels=native,
    )
