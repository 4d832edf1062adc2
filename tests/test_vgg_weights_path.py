"""The pretrained-VGG19 perceptual-loss path, end to end.

The reference always trains its content loss on torchvision's
pretrained VGG19 (``vgg19-dcbb9e9d.pth`` pre-baked into its Docker
image, reference srgan/loss.py:28-34, Dockerfile:11).  These tests pin
every step between "user has the hub file" and "training uses the
pretrained features":

  1. a torchvision-layout ``.pth`` is loaded by ``--vgg-weights``
     (torch-pickle branch of ``_load_vgg_weights``) and the converted
     kernels land in ``trainer.vgg_params``;
  2. ``tools/convert_vgg19.py`` converts the same file to the native
     msgpack ``.ckpt``, which the msgpack branch loads identically;
  3. a truncated trunk (``--vgg-convs``) consumes a full 16-conv file;
  4. the loaded features actually change the GAN generator loss
     (vs the deterministic random-feature fallback);
  5. a bad path raises instead of silently training on random features.
"""

import os
import subprocess
import sys
from argparse import Namespace

import jax
import numpy as np
import pytest
import torch

from tests.test_vgg_conversion import _build_torch_and_sd
from torchsr_tpu.data.synthetic import (
    SyntheticEvalLoader,
    SyntheticTrainLoader,
)
from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
from torchsr_tpu.train.trainer import SRGANTrainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def vgg_pth(tmp_path_factory):
    """A synthetic full-16-conv torchvision-layout VGG19 hub file."""
    _model, sd = _build_torch_and_sd()
    path = tmp_path_factory.mktemp("vgg") / "vgg19-synthetic.pth"
    torch.save(sd, str(path))
    return str(path)


def _trainer(vgg_weights, vgg_convs=2, seed=0):
    args = Namespace(
        batch_size=4, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=seed,
        skip_image_save=True, model="srgan", num_residual=1,
        vgg_convs=vgg_convs, vgg_weights=vgg_weights,
    )
    train_loader = SyntheticTrainLoader(4, 32, n_batches=1)
    eval_loader = SyntheticEvalLoader(4, 32, n_batches=1)
    mesh = make_mesh(num_devices=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    return SRGANTrainer(
        args, train_loader, eval_loader,
        train_loader.dataset_len, eval_loader.dataset_len, mesh, ctx,
    )


def _expected_conv0_kernel(vgg_pth):
    sd = torch.load(vgg_pth, map_location="cpu", weights_only=False)
    return sd["features.0.weight"].numpy().transpose(2, 3, 1, 0)


def test_vgg_weights_pth_loads_into_trainer(vgg_pth):
    trainer = _trainer(vgg_pth)
    got = np.asarray(
        jax.device_get(trainer.vgg_params)["conv0"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(
        got, _expected_conv0_kernel(vgg_pth), atol=0
    )
    # truncated trunk: only the used convs are kept
    assert sorted(jax.device_get(trainer.vgg_params)) == [
        "conv0", "conv1"
    ]


def test_convert_vgg19_tool_roundtrip(vgg_pth, tmp_path):
    """tools/convert_vgg19.py output loads via the msgpack branch."""
    out = str(tmp_path / "vgg19.ckpt")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_vgg19.py"),
         vgg_pth, "--out", out],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert result.returncode == 0, result.stderr
    assert "16 convs" in result.stdout
    trainer = _trainer(out)
    got = np.asarray(
        jax.device_get(trainer.vgg_params)["conv0"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(
        got, _expected_conv0_kernel(vgg_pth), atol=0
    )


@pytest.mark.slow
def test_loaded_vgg_features_drive_the_gan_loss(vgg_pth):
    """Training USES the loaded features: the generator GAN loss differs
    from the random-feature fallback's on an identical step (reference
    behavior: pretrained features are the flagship content loss)."""
    results = {}
    for name, weights in (("random", None), ("pretrained", vgg_pth)):
        trainer = _trainer(weights)
        crops, flips = next(iter(trainer.train_loader.epoch(0)))
        crops_dev, flips_dev = trainer._put(crops, flips)
        _state, metrics = trainer.gan_step(
            trainer.state, crops_dev, flips_dev, 1e-4, 1e-4,
            trainer.vgg_params,
        )
        results[name] = float(metrics["gen_loss"])
        assert np.isfinite(results[name])
    assert results["random"] != results["pretrained"]


def test_missing_vgg_weights_file_raises():
    with pytest.raises(FileNotFoundError):
        _trainer("/nonexistent/vgg19.pth")


def test_cli_plumbs_vgg_weights_flag():
    from torchsr_tpu.cli import parse_args

    args = parse_args(
        ["train", "--vgg-weights", "w.pth", "--model", "srgan"]
    )
    assert args.vgg_weights == "w.pth"
