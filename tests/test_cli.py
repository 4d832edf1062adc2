"""CLI end-to-end: train (tiny) then test, reference flag surface."""

import os

import numpy as np
import pytest
from PIL import Image

from torchsr_tpu.cli import main, parse_args


def test_parse_train_defaults():
    args = parse_args(["train"])
    assert args.function == "train"
    assert args.batch_size == 64
    assert args.epochs == 1000
    assert args.pretrain_epochs == 1000
    assert args.model == "ESRGAN"
    assert args.train_dir == "dataset"
    assert args.seed == 0
    assert not args.disable_amp


def test_parse_test_has_seed():
    # The reference's `test` subcommand lacks --seed and crashes in
    # distributed_params (torchsr.py:152, SURVEY.md section 3.2) — fixed.
    args = parse_args(["test", "photo.png"])
    assert args.function == "test"
    assert args.image == "photo.png"
    assert args.seed == 0


def test_invalid_model_rejected(capsys):
    with pytest.raises(SystemExit):
        parse_args(["train", "--model", "nope"])


def test_dataset_multiplier_validation():
    with pytest.raises(SystemExit):
        parse_args(["train", "--dataset-multiplier", "0"])


def test_tile_overlap_must_be_smaller_than_tile(capsys):
    """overlap >= tile makes the tiling stride non-positive; the CLI
    must reject it with a usage error, not crash inside tiled_upscale."""
    for sub in (["test", "x.png"], ["eval", "val"]):
        with pytest.raises(SystemExit):
            parse_args(sub + ["--tile", "16", "--tile-overlap", "16"])
        # overlap < tile parses fine
        args = parse_args(sub + ["--tile", "16", "--tile-overlap", "8"])
        assert args.tile == 16 and args.tile_overlap == 8
    # whole-image mode (tile=0) ignores the overlap value
    parse_args(["test", "x.png", "--tile-overlap", "16"])


def test_eval_artifact_rejects_bf16(capsys):
    """An artifact's precision is baked at export; --bf16 with
    --artifact is a contradiction and must be a usage error rather
    than silently scoring the artifact's own dtype."""
    with pytest.raises(SystemExit):
        parse_args(["eval", "val", "--artifact", "m.shlo", "--bf16"])
    parse_args(["eval", "val", "--artifact", "m.shlo"])  # alone: fine
    parse_args(["eval", "val", "--bf16"])  # alone: fine


def test_scale_flag_validation():
    """--scale: powers of two only, and --crop-size must divide by it."""
    args = parse_args(["train", "--scale", "2"])
    assert args.upscale_factor == 2
    assert parse_args(["train"]).upscale_factor == 4
    with pytest.raises(SystemExit):
        parse_args(["train", "--scale", "3"])
    with pytest.raises(SystemExit):
        parse_args(["train", "--scale", "8", "--crop-size", "36"])
    parse_args(["train", "--scale", "8", "--crop-size", "32"])


@pytest.mark.slow
def test_cli_train_scale2_then_test(image_dir, tmp_path, monkeypatch):
    """End to end at --scale 2: train a tiny SRGAN, then `test` and
    `export` auto-detect the scale from the checkpoint (no flag)."""
    monkeypatch.chdir(tmp_path)
    main([
        "train",
        "--train-dir", image_dir,
        "--model", "srgan",
        "--scale", "2",
        "--batch-size", "8",
        "--epochs", "1",
        "--pretrain-epochs", "1",
        "--data-workers", "2",
        "--seed", "3",
        "--disable-amp",
        "--skip-image-save",
        "--crop-size", "32",
        "--gen-blocks", "1",
        "--vgg-convs", "2",
    ])
    assert os.path.exists("srgan-gan-best.ckpt")

    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    ).save("input.png")
    main(["test", "input.png", "--model", "srgan"])
    out = np.asarray(Image.open("upres-input.png"))
    assert out.shape == (80, 96, 3)  # 2x, auto-detected

    main([
        "export", "m2.shlo", "--model", "srgan",
        "--tile", "16", "--tile-batch", "2", "--platforms", "cpu",
    ])
    import json

    meta = json.load(open("m2.shlo.json"))
    assert meta["scale"] == 2
    assert meta["output_shape"] == [2, 32, 32, 3]


@pytest.mark.slow
def test_cli_train_then_test(image_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    main([
        "train",
        "--train-dir", image_dir,
        "--model", "srgan",
        "--batch-size", "8",
        "--epochs", "1",
        "--pretrain-epochs", "1",
        "--data-workers", "2",
        "--seed", "3",
        "--disable-amp",
        "--skip-image-save",
        "--crop-size", "32",
        "--gen-blocks", "1",
        "--vgg-convs", "2",
    ])
    assert os.path.exists("srgan-gan-best.ckpt")

    # CLI `test`: upscale an image with the trained checkpoint (the
    # crop-size mismatch doesn't matter: generators are fully conv).
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    ).save("input.png")
    main(["test", "input.png", "--model", "srgan"])
    assert os.path.exists("upres-input.png")
    out = np.asarray(Image.open("upres-input.png"))
    assert out.shape == (160, 192, 3)

    # tiled path produces an output of the same size
    main([
        "test", "input.png", "--model", "srgan",
        "--tile", "32", "--tile-overlap", "8", "--tile-batch", "2",
    ])
    out2 = np.asarray(Image.open("upres-input.png"))
    assert out2.shape == (160, 192, 3)

    # spatially-sharded halo-exchange path (8 virtual devices)
    main([
        "test", "input.png", "--model", "srgan",
        "--spatial-shard", "--tile-overlap", "4",
    ])
    out3 = np.asarray(Image.open("upres-input.png"))
    assert out3.shape == (160, 192, 3)

    # sharded-tile path (tile batch shard_map'd over the 8 devices)
    # matches the single-device tiled output up to uint8 rounding
    main([
        "test", "input.png", "--model", "srgan",
        "--shard-tiles", "--tile", "32", "--tile-overlap", "8",
        "--tile-batch", "8",
    ])
    out4 = np.asarray(Image.open("upres-input.png"))
    assert out4.shape == (160, 192, 3)
    assert np.all(np.abs(out4.astype(int) - out2.astype(int)) <= 1)

    # directory-batch mode: every supported image in the directory is
    # upscaled with the one loaded generator
    os.makedirs("frames", exist_ok=True)
    for i, hw in enumerate([(24, 28), (32, 20)]):
        Image.fromarray(
            rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        ).save(f"frames/f{i}.png")
    main(["test", "frames", "--model", "srgan"])
    assert np.asarray(Image.open("upres-f0.png")).shape == (96, 112, 3)
    assert np.asarray(Image.open("upres-f1.png")).shape == (128, 80, 3)


@pytest.mark.slow
def test_cli_esrgan_pretrain(image_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    main([
        "train",
        "--train-dir", image_dir,
        "--model", "esrgan",
        "--batch-size", "8",
        "--epochs", "0",
        "--pretrain-epochs", "1",
        "--data-workers", "2",
        "--seed", "5",
        "--disable-amp",
        "--skip-image-save",
        "--crop-size", "32",
        "--gen-blocks", "1",
        "--vgg-convs", "2",
    ])
    assert os.path.exists("esrgan-psnr-latest.ckpt")
    assert os.path.exists("esrgan-psnr-best.ckpt")


@pytest.mark.slow
def test_cli_test_without_checkpoint_errors(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    ).save("x.png")
    with pytest.raises(FileNotFoundError, match="no checkpoint found"):
        main(["test", "x.png", "--model", "srgan"])


def test_inference_dtype_resolution(monkeypatch):
    """torchsr test runs bf16 on TPU (the benchmarked configuration),
    f32 on other backends, and --disable-amp forces f32 anywhere."""
    from argparse import Namespace

    import jax
    import jax.numpy as jnp

    from torchsr_tpu.infer.runner import resolve_compute_dtype

    # the test backend is CPU: amp-on still resolves to f32
    assert resolve_compute_dtype(Namespace()) == jnp.float32
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_compute_dtype(Namespace()) == jnp.bfloat16
    assert (
        resolve_compute_dtype(Namespace(disable_amp=True)) == jnp.float32
    )
