"""The ``eval`` subcommand: score a trained generator on HR images.

The reference has no standalone evaluation path — its PSNR eval lives
inside the training loop (reference srgan/trainer.py:260-343) and its
``test`` subcommand writes an image without scoring it (test.py:22-63).
This subcommand runs the standard SR benchmark protocol (the BASELINE.md
DIV2K-val configs) against any directory of HR images:

    HR  ->  LR via the exact training-pipeline synthesis
            (PIL-parity quantized bicubic 1/4x, data/preprocess.py)
        ->  SR = generator(LR)          (whole-image or tiled)
        ->  per-image PSNR + SSIM vs HR

and reports the naive bicubic 4x re-upscale baseline alongside, so a
checkpoint's gain over interpolation is visible in one run.  Two PSNR
aggregates are printed: the mean of per-image PSNRs (how benchmarks are
usually tabulated) and the reference-parity batch formula
``10*log10(1/mean_MSE)`` (one log over the pooled MSE — what the
reference's in-training eval reports, srgan/trainer.py:296).

Images whose sides are not multiples of the scale are cropped (top-left)
to the nearest multiple, the standard benchmark convention.  With
``--tile`` every image runs through one fixed-shape executable
(size-independent compilation); without it each distinct image shape
compiles its own whole-image forward.
"""

from __future__ import annotations

import json
import os
from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np

from torchsr_tpu.data.discovery import discover_images
from torchsr_tpu.infer.runner import load_trained_generator
from torchsr_tpu.infer.tiled import upscale_image
from torchsr_tpu.ops.resize import bicubic_resize
from torchsr_tpu.train.metrics import mse_per_sample, ssim_per_sample
from torchsr_tpu.utils import image_io


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return arr[top:top + size, left:left + size]


def _score_pair(sr: np.ndarray, hr: np.ndarray) -> tuple[float, float, float]:
    """(PSNR dB, SSIM, MSE) of one SR image against its HR ground truth."""
    sr_b = jnp.asarray(sr, jnp.float32)[None]
    hr_b = jnp.asarray(hr, jnp.float32)[None]
    mse = float(mse_per_sample(sr_b, hr_b)[0])
    p = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
    s = float(ssim_per_sample(sr_b, hr_b)[0])
    return p, s, mse


def run_eval(args: Namespace, generator_cls) -> dict:
    """Evaluate ``args.image_dir`` and return the report dict.

    With ``--artifact`` the scoring runs through a StableHLO serving
    artifact (infer/serving.py) instead of a checkpoint — validating
    the exact bytes a serving fleet would run."""
    scale = 4
    artifact = getattr(args, "artifact", None)
    if artifact:
        from torchsr_tpu.infer.serving import ServedGenerator

        served = ServedGenerator(artifact)
        scale = served.scale or 4

        def upscale(lr: np.ndarray) -> np.ndarray:
            return np.asarray(jnp.clip(
                served.upscale_image(
                    lr, overlap=getattr(args, "tile_overlap", 16)
                ), 0.0, 1.0,
            ))
    else:
        # Default f32 (metric-grade precision); --bf16 scores the
        # TPU serving precision instead, quantifying its quality cost.
        dtype_kw = (
            {"dtype": jnp.bfloat16}
            if getattr(args, "bf16", False) else {}
        )
        generator, variables = load_trained_generator(
            args, generator_cls, **dtype_kw
        )
        scale = generator.scale_factor

        def infer_fn(v, batch: jnp.ndarray) -> jnp.ndarray:
            return generator.apply(v, batch, train=False)

        infer_jit = jax.jit(infer_fn)

        def upscale(lr: np.ndarray) -> np.ndarray:
            return upscale_image(
                infer_jit, lr, scale=scale,
                tile=getattr(args, "tile", 0) or 0,
                overlap=getattr(args, "tile_overlap", 16),
                tile_batch=getattr(args, "tile_batch", 8),
                params=variables,
            )

    from torchsr_tpu.data.packed import PackedDataset, is_pack

    if is_pack(args.image_dir):
        # a .tsrpack works anywhere a dataset directory does
        pack = PackedDataset(args.image_dir)
        paths, read_image = pack.names, pack.get
    else:
        paths = discover_images(args.image_dir)
        read_image = image_io.load_image
    if not paths:
        raise ValueError(
            f"no supported images found in directory {args.image_dir}"
        )

    crop = getattr(args, "crop", 0) or 0
    per_image = []
    mse_px_sum = 0.0  # sum of per-image MSE * pixel count
    px_sum = 0
    for path in paths:
        hr_u8 = read_image(path)
        if crop:
            if min(hr_u8.shape[:2]) < crop:
                print(f"skipping {path}: smaller than --crop {crop}")
                continue
            hr_u8 = _center_crop(hr_u8, crop)
        h = hr_u8.shape[0] // scale * scale
        w = hr_u8.shape[1] // scale * scale
        if h < 11 or w < 11:
            # below the 11x11 SSIM window (and too small for the
            # benchmark protocol to mean anything)
            print(f"skipping {path}: smaller than the SSIM window")
            continue
        hr = hr_u8[:h, :w].astype(np.float32) / 255.0

        # The training pipeline's exact LR synthesis: quantized
        # PIL-parity bicubic, so eval measures the distribution the
        # model was trained on (reference dataset.py:88-125 semantics).
        lr = np.asarray(bicubic_resize(
            jnp.asarray(hr)[None], (h // scale, w // scale),
            quantize=True,
        )[0])
        sr = upscale(lr)
        bic = np.asarray(bicubic_resize(
            jnp.asarray(lr)[None], (h, w), quantize=True
        )[0])

        p, s, mse = _score_pair(sr, hr)
        bp, bs, _ = _score_pair(bic, hr)
        mse_px_sum += mse * h * w
        px_sum += h * w
        per_image.append({
            "image": os.path.basename(path), "hw": [h, w],
            "psnr": round(p, 4), "ssim": round(s, 5),
            "bicubic_psnr": round(bp, 4), "bicubic_ssim": round(bs, 5),
        })
        print(
            f"{os.path.basename(path)} ({h}x{w}): "
            f"PSNR {p:.2f} dB  SSIM {s:.4f}  "
            f"(bicubic {bp:.2f} dB / {bs:.4f})"
        )
        if getattr(args, "save_sr", False):
            image_io.save_image(sr, f"upres-{os.path.basename(path)}")

    if not per_image:
        raise ValueError("no image in the directory was evaluable")

    n = len(per_image)
    report = {
        "model": args.model.lower(),
        "images": n,
        "mean_psnr": round(sum(r["psnr"] for r in per_image) / n, 4),
        "mean_ssim": round(sum(r["ssim"] for r in per_image) / n, 5),
        # The reference's in-training formula: one log10 over the MSE
        # pooled across every pixel it saw (srgan/trainer.py:296) —
        # per-image MSEs are pixel-count weighted so mixed-size
        # directories pool correctly.
        "batch_psnr": round(
            float(10.0 * np.log10(
                1.0 / max(mse_px_sum / max(px_sum, 1), 1e-12)
            )), 4
        ),
        "mean_bicubic_psnr": round(
            sum(r["bicubic_psnr"] for r in per_image) / n, 4
        ),
        "mean_bicubic_ssim": round(
            sum(r["bicubic_ssim"] for r in per_image) / n, 5
        ),
        "per_image": per_image,
    }
    # SR-vs-bicubic margins (positive = the model beats the naive
    # baseline) — the quality-evidence headline numbers.
    report["psnr_margin_db"] = round(
        report["mean_psnr"] - report["mean_bicubic_psnr"], 4
    )
    report["ssim_margin"] = round(
        report["mean_ssim"] - report["mean_bicubic_ssim"], 5
    )
    report["images_beating_bicubic_psnr"] = sum(
        1 for r in per_image if r["psnr"] > r["bicubic_psnr"]
    )
    print(
        f"\n{n} images: mean PSNR {report['mean_psnr']:.2f} dB  "
        f"mean SSIM {report['mean_ssim']:.4f}  "
        f"(batch PSNR {report['batch_psnr']:.2f} dB; bicubic baseline "
        f"{report['mean_bicubic_psnr']:.2f} dB / "
        f"{report['mean_bicubic_ssim']:.4f}; margin "
        f"{report['psnr_margin_db']:+.2f} dB / "
        f"{report['ssim_margin']:+.4f}; "
        f"{report['images_beating_bicubic_psnr']}/{n} images beat "
        f"bicubic PSNR)"
    )
    report_path = getattr(args, "report", None)
    if report_path:
        with open(report_path, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"Wrote report to {report_path}")
    return report
