"""WandB metric-key contract test (SURVEY.md section 5 key list).

Runs one tiny epoch of each phase with a stub wandb module and asserts
the exact keys the reference emits (srgan/trainer.py:311-319, :393-412,
:459-466, :520-526) plus the additive SSIM keys.
"""

from argparse import Namespace

import pytest

import torchsr_tpu.utils.logging as tlog
from torchsr_tpu.data.synthetic import (
    SyntheticEvalLoader,
    SyntheticTrainLoader,
)
from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
from torchsr_tpu.train.trainer import SRGANTrainer


class _WandbStub:
    def __init__(self):
        self.logged = []

    def init(self, **kwargs):
        return self

    def log(self, contents, step=None):
        self.logged.append((dict(contents), step))

    def finish(self):
        pass

    def Image(self, arr):  # noqa: N802 (wandb API name)
        return arr

    def __bool__(self):
        return True


@pytest.mark.slow
def test_metric_key_contract(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    stub = _WandbStub()
    monkeypatch.setattr(tlog, "wandb", stub)

    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
    )
    tl = SyntheticTrainLoader(8, 32, n_batches=1)
    el = SyntheticEvalLoader(8, 32, n_batches=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    trainer = SRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, make_mesh(), ctx
    )
    trainer.train()

    keys = set()
    for contents, _step in stub.logged:
        keys.update(contents.keys())

    # Reference contract (SURVEY.md section 5)
    expected = {
        "psnr/train-loss", "psnr/epoch", "psnr/throughput/train",
        "psnr/PSNR", "psnr/val-loss", "psnr/throughput/test",
        "gan/disc-lr", "gan/gen-lr", "gan/train-loss",
        "gan/throughput/train", "gan/epoch",
        "gan/PSNR", "gan/val-loss", "gan/throughput/test",
        # additive capability
        "psnr/SSIM", "gan/SSIM",
    }
    missing = expected - keys
    assert not missing, f"missing metric keys: {missing}"

    # per-step logging carried the reference's global step counter
    steps = [s for _c, s in stub.logged if s is not None]
    assert steps and all(isinstance(s, int) for s in steps)
