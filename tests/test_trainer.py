"""End-to-end trainer integration tests on tiny configs (CPU, 8-dev mesh).

Covers the two-phase recipe, checkpoint best/latest semantics, resume,
and the data-parallel sharded step — the test strategy SURVEY.md
section 4 prescribes (the reference ships no tests).
"""

import os
from argparse import Namespace

import numpy as np
import pytest

from torchsr_tpu.data.loader import initialize_datasets
from torchsr_tpu.parallel.mesh import DistributedContext, make_mesh
from torchsr_tpu.utils.checkpoint import load_checkpoint


def _args(**kwargs) -> Namespace:
    base = dict(
        batch_size=8,
        data_workers=2,
        dataset_multiplier=1,
        disable_amp=True,  # f32 on CPU
        epochs=1,
        gan_checkpoint=None,
        master_addr=None,
        master_port=None,
        model="srgan",
        pretrain_epochs=1,
        psnr_checkpoint=None,
        seed=1,
        skip_image_save=True,
        train_dir="",
        num_residual=1,   # tiny models for CPU speed
        vgg_convs=2,
    )
    base.update(kwargs)
    return Namespace(**base)


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _make_trainer(image_dir, args):
    from torchsr_tpu.registry import select_trainer_model

    trainer_cls, _crop = select_trainer_model(args)
    crop = 32  # small crops for CPU
    loaders = initialize_datasets(
        image_dir, batch_size=args.batch_size, crop_size=crop,
        dataset_multiplier=args.dataset_multiplier,
        workers=args.data_workers, seed=args.seed,
    )
    mesh = make_mesh()
    ctx = DistributedContext(1, -1, -1, 1, False)
    return trainer_cls(args, *loaders, mesh, ctx)


@pytest.mark.slow
def test_srgan_full_recipe(image_dir, workdir):
    args = _args(model="srgan")
    trainer = _make_trainer(image_dir, args)
    assert len(trainer.mesh.devices.ravel()) == 8  # virtual CPU mesh
    trainer.train()

    # best/latest checkpoints for both phases (reference naming contract)
    for name in (
        "srgan-psnr-latest.ckpt", "srgan-psnr-best.ckpt",
        "srgan-gan-latest.ckpt", "srgan-gan-best.ckpt",
    ):
        assert os.path.exists(name), name

    ckpt = load_checkpoint("srgan-gan-best.ckpt")
    assert ckpt["epoch"] == 1
    assert ckpt["phase"] == "srgan-gan"
    assert "params" in ckpt["state"]
    assert "extra" in ckpt  # lossless resume payload


@pytest.mark.slow
def test_srgan_resume_from_checkpoint(image_dir, workdir):
    args = _args(model="srgan", epochs=1, pretrain_epochs=2)
    trainer = _make_trainer(image_dir, args)
    trainer._pretrain()
    ckpt = load_checkpoint("srgan-psnr-latest.ckpt")
    assert ckpt["epoch"] == 2

    # A fresh trainer resumes pretraining at the stored epoch
    # (reference re-runs the saved epoch, srgan/trainer.py:367).
    trainer2 = _make_trainer(image_dir, args)
    restored_epoch = trainer2._restore(ckpt, "psnr")
    assert restored_epoch == 2
    p_old = np.asarray(
        next(iter(
            __import__("jax").tree.leaves(trainer2.state.gen_params)
        ))
    )
    p_ckpt = np.asarray(
        next(iter(
            __import__("jax").tree.leaves(ckpt["state"]["params"])
        ))
    )
    np.testing.assert_allclose(p_old.ravel(), p_ckpt.ravel(), atol=1e-6)


@pytest.mark.slow
def test_esrgan_gan_step(image_dir, workdir):
    args = _args(model="esrgan", epochs=1, pretrain_epochs=0)
    trainer = _make_trainer(image_dir, args)
    crops, flips = next(iter(trainer.train_loader.epoch(0)))
    crops_dev, flips_dev = trainer._put(crops, flips)
    import jax

    # the step donates its input state: snapshot params first
    before = jax.device_get(trainer.state.gen_params)
    state, metrics = trainer.gan_step(
        trainer.state, crops_dev, flips_dev, 1e-4, 1e-4,
        trainer.vgg_params,
    )
    trainer.state = state
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, jax.device_get(state.gen_params),
    )
    assert max(jax.tree.leaves(moved)) > 0


@pytest.mark.slow
def test_esrgan_full_recipe(image_dir, workdir):
    """ESRGAN two-phase train() end to end (reference
    esrgan/trainer.py:550-560): both phases run, all four checkpoint
    files land, the GAN checkpoint carries the lossless extras."""
    args = _args(model="esrgan")
    trainer = _make_trainer(image_dir, args)
    trainer.train()

    for name in (
        "esrgan-psnr-latest.ckpt", "esrgan-psnr-best.ckpt",
        "esrgan-gan-latest.ckpt", "esrgan-gan-best.ckpt",
    ):
        assert os.path.exists(name), name

    ckpt = load_checkpoint("esrgan-gan-best.ckpt")
    assert ckpt["epoch"] == 1
    assert ckpt["phase"] == "esrgan-gan"
    assert "params" in ckpt["state"]
    assert "extra" in ckpt
    # resume machinery consumes its own artifact
    trainer2 = _make_trainer(image_dir, args)
    assert trainer2._restore(ckpt, "gan") == 1


@pytest.mark.slow
def test_fast_compile_checkpoint_interop(image_dir, workdir):
    """--fast-compile (nn.scan tower) trains, saves checkpoints in the
    canonical UNROLLED layout, and its checkpoints restore into normal
    trainers and vice versa (models/scan_compat.py); incompatible
    optimizer extras degrade to weights-only with a log, not a crash."""
    import jax

    args = _args(model="srgan", fast_compile=True, pretrain_epochs=1)
    tr = _make_trainer(image_dir, args)
    assert "blocks_scan" in jax.device_get(tr.state.gen_params)
    tr._pretrain()
    ckpt = load_checkpoint("srgan-psnr-latest.ckpt")
    params = ckpt["state"]["params"]
    assert "blocks_scan" not in params
    assert any(str(k).startswith("block") for k in params)

    # normal trainer consumes the fast-compile checkpoint
    tr2 = _make_trainer(image_dir, _args(model="srgan"))
    assert tr2._restore(ckpt, "psnr") == 1
    got = jax.device_get(tr2.state.gen_params)["block0"]
    want = params["block0"]
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(got)[0]),
        np.asarray(jax.tree.leaves(want)[0]), atol=1e-6,
    )

    # fast-compile trainer consumes the (canonical) checkpoint too
    tr3 = _make_trainer(image_dir, args)
    assert tr3._restore(ckpt, "psnr") == 1
    stacked = jax.device_get(tr3.state.gen_params)["blocks_scan"]
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(stacked)[0][0]),
        np.asarray(jax.tree.leaves(want)[0]), atol=1e-6,
    )


def _eval_psnr(trainer) -> float:
    """Masked mean eval PSNR over the trainer's test loader (the
    trainer._test metric without the checkpoint/logging side effects)."""
    bs = trainer.test_loader.batch_size
    total, batches = 0.0, 0
    for crops, valid in trainer.test_loader:
        mask = (np.arange(bs) < valid).astype(np.float32)
        crops_dev, mask_dev = trainer._put(crops, mask)
        p, _s, _l = trainer.eval_step(
            trainer.state.gen_params, trainer.state.gen_stats,
            crops_dev, mask_dev,
        )
        total += float(p)
        batches += 1
    return total / max(batches, 1)


@pytest.mark.slow
@pytest.mark.parametrize("model,epochs", [("srgan", 30), ("esrgan", 25)])
def test_pretrain_learning_raises_psnr(model, epochs,
                                       structured_image_dir, workdir):
    """The production pretrain path OPTIMIZES: over a few epochs on
    structured (learnable) images, eval PSNR must rise by a clear
    margin over the random-init generator (measured: SRGAN ~+3.5 dB,
    ESRGAN ~+6.8 dB at these epoch counts).  This CI-izes the round-2
    manual real-TPU learning validation (+11.6 dB over 25 epochs,
    docs/benchmarks.md) — loss-finiteness and one-step param-movement
    checks alone cannot catch sign/scale bugs that still 'train'."""
    args = _args(model=model, pretrain_epochs=epochs, seed=3)
    trainer = _make_trainer(structured_image_dir, args)
    initial = _eval_psnr(trainer)
    trainer._pretrain()
    final = _eval_psnr(trainer)
    assert final - initial >= 2.5, (
        f"eval PSNR rose only {final - initial:.2f} dB "
        f"({initial:.2f} -> {final:.2f}) over "
        f"{args.pretrain_epochs} pretrain epochs"
    )


@pytest.mark.slow
def test_sample_image_render(image_dir, workdir):
    """The per-epoch progress render (reference srgan/trainer.py:128-134,
    :335-343): with the bundled media/ sample present, eval writes
    output/SR_epoch{N}.png at 4x the sample's resolution."""
    from PIL import Image

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sample = os.path.join(repo, "media", "waterfalls-low-res.png")
    assert os.path.exists(sample), "bundled media/ sample is missing"
    args = _args(model="srgan", skip_image_save=False,
                 sample_image=sample)
    trainer = _make_trainer(image_dir, args)
    assert trainer.sample_image is not None
    trainer._test(1, "srgan-psnr", 0)
    out = os.path.join("output", "SR_epoch1.png")
    assert os.path.exists(out)
    with Image.open(sample) as lo, Image.open(out) as hi:
        assert hi.size == (lo.size[0] * 4, lo.size[1] * 4)
