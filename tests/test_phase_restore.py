"""Cross-phase restore semantics: GAN init from PSNR weights must not
inherit the pretrain best-PSNR record (regression: the GAN phase never
wrote its -best checkpoint because pretrain's 21 dB record leaked in)."""

from argparse import Namespace

import numpy as np
import pytest

from torchsr_tpu.data.synthetic import (
    SyntheticEvalLoader,
    SyntheticTrainLoader,
)
from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
from torchsr_tpu.train.trainer import SRGANTrainer


def _trainer():
    args = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
    )
    tl = SyntheticTrainLoader(8, 32, n_batches=1)
    el = SyntheticEvalLoader(8, 32, n_batches=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    return SRGANTrainer(
        args, tl, el, tl.dataset_len, el.dataset_len, make_mesh(), ctx
    )


@pytest.mark.slow
def test_cross_phase_restore_is_weights_only(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    trainer = _trainer()
    trainer.best_psnr = 42.0
    trainer._save(3, "srgan-psnr", "latest")
    trainer._wait_saves()  # _save is async by default

    from torchsr_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint("srgan-psnr-latest.ckpt")
    assert ckpt["extra"]["best_psnr"] == 42.0

    # same-phase restore adopts the record and the epoch
    trainer2 = _trainer()
    trainer2.best_psnr = -1.0
    epoch = trainer2._restore(ckpt, "psnr")
    assert epoch == 3
    assert trainer2.best_psnr == 42.0

    # cross-phase restore (GAN init from PSNR weights) must NOT: each
    # phase tracks its own record so {model}-gan-best gets written
    trainer3 = _trainer()
    trainer3.best_psnr = -1.0
    trainer3._restore(ckpt, "gan")
    assert trainer3.best_psnr == -1.0


@pytest.mark.slow
def test_gan_best_written_even_when_pretrain_psnr_higher(
    image_dir, tmp_path, monkeypatch
):
    import os

    monkeypatch.chdir(tmp_path)
    trainer = _trainer()
    trainer._pretrain()
    # simulate a strong pretrain record having been persisted
    trainer.best_psnr = 99.0
    trainer._save(1, "srgan-psnr", "latest")

    trainer._gan_train()
    assert os.path.exists("srgan-gan-best.ckpt"), (
        "GAN phase must write its own -best checkpoint regardless of "
        "the pretrain record"
    )


def test_match_tree_rejects_extra_keys():
    """flax from_state_dict silently DROPS keys the template lacks;
    _match_tree must turn that into a loud architecture-mismatch error
    (a 4x checkpoint resumed with --scale 2 was a silent partial
    restore before this check)."""
    import numpy as np

    from torchsr_tpu.train.trainer import _match_tree

    tpl = {"upsample0": {"kernel": np.zeros((2, 2))}}
    ok = {"upsample0": {"kernel": np.ones((2, 2))}}
    np.testing.assert_array_equal(
        _match_tree(tpl, ok)["upsample0"]["kernel"], np.ones((2, 2))
    )

    extra_top = dict(ok, upsample1={"kernel": np.ones((2, 2))})
    with pytest.raises(ValueError, match="upsample1.*mismatch"):
        _match_tree(tpl, extra_top)
    # nested extras are caught with their path too
    extra_nested = {"upsample0": {"kernel": np.ones((2, 2)),
                                  "bias": np.ones((2,))}}
    with pytest.raises(ValueError, match="upsample0/bias"):
        _match_tree(tpl, extra_nested)
    # the VGG path truncates its template deliberately
    out = _match_tree(tpl, extra_top, allow_extra=True)
    assert set(out) == {"upsample0"}


@pytest.mark.slow
def test_scale_mismatch_resume_raises(tmp_path, monkeypatch):
    """Resuming with a different --scale than the checkpoint must error,
    not silently drop the extra upsample stage."""
    monkeypatch.chdir(tmp_path)
    trainer4 = _trainer()  # default scale 4
    trainer4._save(1, "srgan-psnr", "latest")
    trainer4._wait_saves()

    args2 = Namespace(
        batch_size=8, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model="srgan", num_residual=1, vgg_convs=2,
        upscale_factor=2, crop_size=32,
    )
    tl = SyntheticTrainLoader(8, 32, n_batches=1)
    el = SyntheticEvalLoader(8, 32, n_batches=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    trainer2 = SRGANTrainer(
        args2, tl, el, tl.dataset_len, el.dataset_len, make_mesh(), ctx
    )
    with pytest.raises(ValueError, match="mismatch"):
        trainer2._pretrain()
