"""External pretrained-weight import: the public RRDBNet naming schemes.

The xinntao ESRGAN (old- and new-arch) and BasicSR Real-ESRGAN
checkpoints share the reference generator's graph under different
module names (torch_compat._canonical_esrgan_sd).  These tests build
the renames INDEPENDENTLY (reference-name -> external-name, the inverse
direction of the converter) from each scheme's published key layout, so
a mapping bug on either side fails the round-trip.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torchsr_tpu.models import ESRGANGenerator
from torchsr_tpu.models.torch_compat import (
    convert_esrgan_generator,
    export_esrgan_generator,
)
from torchsr_tpu.utils.checkpoint import load_checkpoint

N_BLOCKS = 2


def _tiny_variables():
    gen = ESRGANGenerator(num_rrdb_blocks=N_BLOCKS, fused_rdb=False)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    return gen, gen.init(jax.random.PRNGKey(0), x, train=False)


def _to_old_arch(key: str) -> str:
    """reference name -> xinntao old-arch (RRDB_ESRGAN_x4.pth) name."""
    key = re.sub(r"^blocks\.(\d+)\.(RDB\d)\.(conv[1-4])\.0\.",
                 r"model.1.sub.\1.\2.\3.0.", key)
    key = re.sub(r"^blocks\.(\d+)\.(RDB\d)\.conv5\.",
                 r"model.1.sub.\1.\2.conv5.0.", key)
    key = re.sub(r"^conv1\.", "model.0.", key)
    key = re.sub(r"^conv2\.", f"model.1.sub.{N_BLOCKS}.", key)
    key = re.sub(r"^upsample1\.", "model.3.", key)
    key = re.sub(r"^upsample2\.", "model.6.", key)
    key = re.sub(r"^conv3\.0\.", "model.8.", key)
    key = re.sub(r"^conv4\.", "model.10.", key)
    return key


def _to_new_arch(key: str) -> str:
    """reference name -> xinntao new-arch (RRDBNet) name."""
    key = re.sub(r"^blocks\.(\d+)\.(RDB\d)\.(conv\d)(?:\.0)?\.",
                 r"RRDB_trunk.\1.\2.\3.", key)
    key = re.sub(r"^conv1\.", "conv_first.", key)
    key = re.sub(r"^conv2\.", "trunk_conv.", key)
    key = re.sub(r"^upsample1\.", "upconv1.", key)
    key = re.sub(r"^upsample2\.", "upconv2.", key)
    key = re.sub(r"^conv3\.0\.", "HRconv.", key)
    key = re.sub(r"^conv4\.", "conv_last.", key)
    return key


def _to_basicsr(key: str) -> str:
    """reference name -> BasicSR RRDBNet (RealESRGAN_x4plus.pth) name."""
    key = re.sub(r"^blocks\.(\d+)\.RDB(\d)\.(conv\d)(?:\.0)?\.",
                 r"body.\1.rdb\2.\3.", key)
    key = re.sub(r"^conv1\.", "conv_first.", key)
    key = re.sub(r"^conv2\.", "conv_body.", key)
    key = re.sub(r"^upsample1\.", "conv_up1.", key)
    key = re.sub(r"^upsample2\.", "conv_up2.", key)
    key = re.sub(r"^conv3\.0\.", "conv_hr.", key)
    key = re.sub(r"^conv4\.", "conv_last.", key)
    return key


_SCHEMES = {
    "old_arch": _to_old_arch,
    "new_arch": _to_new_arch,
    "basicsr": _to_basicsr,
}


def _assert_params_equal(got, want):
    got_flat = jax.tree_util.tree_flatten_with_path(got)[0]
    want_flat = jax.tree_util.tree_flatten_with_path(want)[0]
    assert [p for p, _ in got_flat] == [p for p, _ in want_flat]
    for (path, g), (_, w) in zip(got_flat, want_flat):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w), err_msg=str(path)
        )


@pytest.mark.parametrize("scheme", sorted(_SCHEMES))
def test_external_scheme_roundtrip(scheme):
    """export -> rename to the external scheme -> convert == original."""
    _, variables = _tiny_variables()
    sd_ref = export_esrgan_generator(variables)
    sd_ext = {_SCHEMES[scheme](k): v for k, v in sd_ref.items()}
    assert not set(sd_ext) & set(sd_ref), "rename left reference keys"
    got = convert_esrgan_generator(sd_ext)
    _assert_params_equal(got["params"], variables["params"])


def test_reference_names_unaffected():
    _, variables = _tiny_variables()
    sd_ref = export_esrgan_generator(variables)
    got = convert_esrgan_generator(sd_ref)
    _assert_params_equal(got["params"], variables["params"])


def test_basicsr_pth_end_to_end(tmp_path):
    """A params_ema-wrapped BasicSR .pth loads and runs inference."""
    gen, variables = _tiny_variables()
    sd = {
        _to_basicsr(k): v
        for k, v in export_esrgan_generator(variables).items()
    }
    path = tmp_path / "RealESRGAN_x4plus.pth"
    torch.save({"params_ema": sd}, path)

    loaded = load_checkpoint(str(path))  # model sniffed from keys
    _assert_params_equal(loaded["state"]["params"], variables["params"])

    x = jnp.linspace(0, 1, 1 * 8 * 8 * 3, dtype=jnp.float32).reshape(
        1, 8, 8, 3
    )
    want = gen.apply({"params": variables["params"]}, x, train=False)
    got = gen.apply({"params": loaded["state"]["params"]}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-6
    )
    assert got.shape == (1, 32, 32, 3)


def test_cli_test_with_external_pth(tmp_path, monkeypatch):
    """`torchsr test photo.png --checkpoint RealESRGAN_x4plus.pth`
    upscales with an external-named checkpoint end to end (block count
    and scale auto-detected from the converted tree)."""
    from PIL import Image

    from torchsr_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    _, variables = _tiny_variables()
    sd = {
        _to_basicsr(k): v
        for k, v in export_esrgan_generator(variables).items()
    }
    torch.save({"params_ema": sd}, "RealESRGAN_x4plus.pth")
    rng = np.random.default_rng(3)
    Image.fromarray(
        rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    ).save("photo.png")

    main([
        "test", "photo.png", "--model", "esrgan",
        "--checkpoint", "RealESRGAN_x4plus.pth",
    ])
    out = np.asarray(Image.open("upres-photo.png"))
    assert out.shape == (80, 96, 3)


@pytest.mark.slow
def test_cli_finetune_from_external_pth(image_dir, tmp_path, monkeypatch):
    """Fine-tuning public weights: `train --pretrain-epochs 0
    --gan-checkpoint RealESRGAN_x4plus.pth` initializes the GAN phase
    from the external generator (weights-only restore) and trains."""
    from torchsr_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    _, variables = _tiny_variables()
    sd = {
        _to_basicsr(k): v
        for k, v in export_esrgan_generator(variables).items()
    }
    torch.save({"params_ema": sd}, "RealESRGAN_x4plus.pth")

    main([
        "train",
        "--train-dir", image_dir,
        "--model", "esrgan",
        "--batch-size", "8",
        "--epochs", "1",
        "--pretrain-epochs", "0",
        "--gan-checkpoint", "RealESRGAN_x4plus.pth",
        "--data-workers", "2",
        "--seed", "5",
        "--disable-amp",
        "--skip-image-save",
        "--crop-size", "32",
        "--gen-blocks", str(N_BLOCKS),
        "--vgg-convs", "2",
        "--sync-saves",
    ])
    import os

    assert os.path.exists("esrgan-gan-latest.ckpt")
    trained = load_checkpoint("esrgan-gan-latest.ckpt")
    leaves0 = jax.tree_util.tree_leaves(variables["params"])
    leaves1 = jax.tree_util.tree_leaves(trained["state"]["params"])
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves1)
    )
    assert moved, "GAN fine-tune epoch left external weights untouched"


def test_pixel_unshuffle_input_rejected():
    """2x Real-ESRGAN variants (12-channel conv_first) raise loudly."""
    sd = {
        "conv_first.weight": torch.zeros(64, 12, 3, 3),
        "conv_first.bias": torch.zeros(64),
        "body.0.rdb1.conv1.weight": torch.zeros(32, 64, 3, 3),
    }
    with pytest.raises(ValueError, match="pixel-unshuffle"):
        convert_esrgan_generator(sd)


@pytest.mark.parametrize("scheme", ["rrdbnet", "basicsr"])
def test_externalize_matches_independent_maps(scheme):
    """The outbound renamer agrees with this file's independently
    written reference->external maps, and roundtrips through the
    importer back to the original params."""
    from torchsr_tpu.models.torch_compat import externalize_esrgan_sd

    _, variables = _tiny_variables()
    sd_ref = export_esrgan_generator(variables)
    ext = externalize_esrgan_sd(sd_ref, scheme)
    mapper = _to_new_arch if scheme == "rrdbnet" else _to_basicsr
    assert set(ext) == {mapper(k) for k in sd_ref}
    got = convert_esrgan_generator(ext)
    _assert_params_equal(got["params"], variables["params"])


def test_externalize_rejects_unknown(tmp_path):
    from torchsr_tpu.models.torch_compat import externalize_esrgan_sd

    with pytest.raises(ValueError, match="unknown scheme"):
        externalize_esrgan_sd({}, "caffe")
    with pytest.raises(ValueError, match="cannot externalize"):
        externalize_esrgan_sd(
            {"discriminator.weight": torch.zeros(1)}, "basicsr"
        )


def test_export_tool_basicsr_scheme(tmp_path, monkeypatch):
    """tools/export_torch_checkpoint.py --scheme basicsr writes a
    params-wrapped archive that loads back through every entry point."""
    import subprocess
    import sys
    from pathlib import Path

    from torchsr_tpu.utils.checkpoint import save_checkpoint

    repo = Path(__file__).resolve().parents[1]
    monkeypatch.chdir(tmp_path)
    gen, variables = _tiny_variables()
    save_checkpoint(
        "esrgan-gan-best.ckpt", 4, "esrgan-gan",
        jax.tree_util.tree_map(np.asarray, dict(variables)),
    )
    proc = subprocess.run(
        [sys.executable, str(repo / "tools/export_torch_checkpoint.py"),
         "esrgan-gan-best.ckpt", "--model", "esrgan",
         "--scheme", "basicsr", "--out", "exported.pth"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**__import__("os").environ},
    )
    assert proc.returncode == 0, proc.stderr
    raw = torch.load("exported.pth", weights_only=False)
    assert set(raw) == {"params"}
    assert "conv_first.weight" in raw["params"]
    loaded = load_checkpoint("exported.pth")
    _assert_params_equal(loaded["state"]["params"], variables["params"])


def test_unrecognized_external_keys_rejected():
    _, variables = _tiny_variables()
    sd = {
        _to_basicsr(k): v
        for k, v in export_esrgan_generator(variables).items()
    }
    sd["conv_up3.weight"] = torch.zeros(64, 64, 3, 3)
    with pytest.raises(ValueError, match="conv_up3"):
        convert_esrgan_generator(sd)
