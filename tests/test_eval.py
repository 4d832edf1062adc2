"""The ``eval`` subcommand: DIV2K-val-protocol scoring of a checkpoint.

The reference has no standalone evaluation (its PSNR eval is embedded in
training, reference srgan/trainer.py:260-343); torchsr_tpu adds one
(infer/evaluate.py): exact training-pipeline LR synthesis, per-image
PSNR/SSIM vs ground truth, naive-bicubic baseline alongside.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from torchsr_tpu.cli import main, parse_args
from torchsr_tpu.models import SRGANGenerator
from torchsr_tpu.utils.checkpoint import save_checkpoint


def test_parse_eval_defaults():
    args = parse_args(["eval", "valdir"])
    assert args.function == "eval"
    assert args.image_dir == "valdir"
    assert args.tile == 0
    assert args.crop is None
    assert not args.save_sr


def _tiny_srgan_checkpoint(name="srgan-gan-best.ckpt"):
    gen = SRGANGenerator(num_residual=1)
    x = jnp.zeros((1, 8, 8, 3))
    variables = gen.init(jax.random.PRNGKey(0), x, train=False)
    save_checkpoint(
        name, 1, "gan", jax.tree.map(np.asarray, dict(variables))
    )


def _structured(rng, h, w):
    """Smooth gradient + blocks: bicubic upscaling recovers real signal,
    so the baseline PSNR is meaningfully positive."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        127 + 80 * np.sin(yy / 9.0) + 40 * np.cos(xx / 7.0)
    )[..., None].repeat(3, axis=2)
    noise = rng.normal(0, 6, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(11)
    os.makedirs("val")
    # mixed sizes incl. one not a multiple of 4 (cropped to 36x44) and
    # one smaller than the scale (skipped)
    Image.fromarray(_structured(rng, 40, 48)).save("val/a.png")
    Image.fromarray(_structured(rng, 38, 45)).save("val/b.png")
    Image.fromarray(_structured(rng, 3, 3)).save("val/tiny.png")
    # crops to 8x8 (a x4 multiple) but is below the 11x11 SSIM window
    Image.fromarray(_structured(rng, 10, 10)).save("val/small.png")
    _tiny_srgan_checkpoint()

    main([
        "eval", "val", "--model", "srgan",
        "--report", "report.json", "--save-sr",
    ])

    with open("report.json") as fh:
        report = json.load(fh)
    assert report["images"] == 2  # tiny.png skipped
    names = {r["image"] for r in report["per_image"]}
    assert names == {"a.png", "b.png"}
    hws = {tuple(r["hw"]) for r in report["per_image"]}
    assert hws == {(40, 48), (36, 44)}  # b.png cropped to x4 multiple
    for key in ("mean_psnr", "batch_psnr", "mean_bicubic_psnr"):
        assert np.isfinite(report[key]), report
    assert -1.0 <= report["mean_ssim"] <= 1.0
    assert -1.0 <= report["mean_bicubic_ssim"] <= 1.0
    # structured images: the bicubic baseline recovers real signal
    assert report["mean_bicubic_psnr"] > 15.0, report
    # SR-vs-bicubic margin fields are internally consistent
    assert report["psnr_margin_db"] == pytest.approx(
        report["mean_psnr"] - report["mean_bicubic_psnr"], abs=1e-3
    )
    assert report["ssim_margin"] == pytest.approx(
        report["mean_ssim"] - report["mean_bicubic_ssim"], abs=1e-4
    )
    assert 0 <= report["images_beating_bicubic_psnr"] <= report["images"]
    # --save-sr wrote the SR images (4x the synthesized LR = HR size)
    sr = np.asarray(Image.open("upres-a.png"))
    assert sr.shape == (40, 48, 3)


@pytest.mark.slow
def test_eval_crop_mode_single_shape(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(12)
    os.makedirs("val")
    Image.fromarray(_structured(rng, 40, 48)).save("val/a.png")
    Image.fromarray(_structured(rng, 36, 60)).save("val/b.png")
    Image.fromarray(_structured(rng, 20, 20)).save("val/small.png")
    _tiny_srgan_checkpoint()

    main([
        "eval", "val", "--model", "srgan", "--crop", "32",
        "--report", "report.json",
    ])
    with open("report.json") as fh:
        report = json.load(fh)
    assert report["images"] == 2  # small.png < --crop 32 is skipped
    assert all(tuple(r["hw"]) == (32, 32) for r in report["per_image"])


@pytest.mark.slow
def test_eval_serving_artifact(tmp_path, monkeypatch):
    """--artifact scores the exact StableHLO serving artifact a fleet
    would run (tiled through the artifact's fixed shape)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(13)
    os.makedirs("val")
    Image.fromarray(_structured(rng, 40, 48)).save("val/a.png")
    _tiny_srgan_checkpoint()
    main([
        "export", "m.shlo", "--model", "srgan",
        "--tile", "8", "--tile-batch", "2", "--platforms", "cpu",
    ])
    main([
        "eval", "val", "--model", "srgan", "--artifact", "m.shlo",
        "--report", "report.json",
    ])
    with open("report.json") as fh:
        report = json.load(fh)
    assert report["images"] == 1
    assert np.isfinite(report["mean_psnr"])
    assert -1.0 <= report["mean_ssim"] <= 1.0


def test_negative_tile_rejected():
    with pytest.raises(SystemExit):
        parse_args(["eval", "valdir", "--tile", "-4"])
    with pytest.raises(SystemExit):
        parse_args(["test", "x.png", "--tile", "-4"])
    with pytest.raises(SystemExit):
        parse_args(["test", "x.png", "--tile-batch", "0"])


def test_eval_empty_dir_raises(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("val")
    _tiny_srgan_checkpoint()
    with pytest.raises(ValueError, match="no supported images"):
        main(["eval", "val", "--model", "srgan"])


@pytest.mark.slow
def test_eval_bf16_matches_f32(tmp_path, monkeypatch):
    """--bf16 scores the TPU serving precision; on structured content
    its PSNR must sit within a whisker of the f32 score (bf16 rel. eps
    2^-8 ~ the uint8 quantization step)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(14)
    os.makedirs("val")
    Image.fromarray(_structured(rng, 40, 48)).save("val/a.png")
    _tiny_srgan_checkpoint()

    main([
        "eval", "val", "--model", "srgan", "--report", "f32.json",
    ])
    main([
        "eval", "val", "--model", "srgan", "--bf16",
        "--report", "bf16.json",
    ])
    with open("f32.json") as fh:
        f32 = json.load(fh)
    with open("bf16.json") as fh:
        b16 = json.load(fh)
    assert abs(f32["mean_psnr"] - b16["mean_psnr"]) < 0.5, (f32, b16)
    assert abs(f32["mean_ssim"] - b16["mean_ssim"]) < 0.02
