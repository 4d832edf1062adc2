"""Multi-step lockstep parity with the reference trainer math.

``test_step_parity`` pins ONE pretrain step and ONE GAN step against
torch executing the reference's exact math.  This file extends that to a
*trajectory*: N successive steps on distinct batches, re-synchronised to
torch's post-step parameters between steps (without re-sync the ~1e-6
per-step fp differences amplify chaotically through Adam's g/(|g|+eps)
sign function — see test_step_parity.py).  Because parameters are
re-synced but optimizer state is NOT, agreement at step k additionally
proves the step-count-dependent machinery: Adam's bias-correction
factors (1-beta^t) at t=2,3 and the moment accumulators evolved from
our own step-(k-1) gradients.

Also pins the StepLR schedule sequence (reference srgan/trainer.py:
186-195: StepLR(step_size=epochs//8, gamma=0.6) stepped once per epoch)
value-for-value against torch.optim.lr_scheduler.StepLR.
"""

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_esrgan_parity import _TorchESRGANGen
from tests.test_reference_parity import _TorchSRGANGen
from tests.test_step_parity import (
    BATCH,
    CROP,
    LR,
    _adam,
    _assert_tree_close,
    _copy_tree,
    _grad_sd,
    _install_weights,
    _make_trainer,
    _torch_discriminator,
    _torch_vgg_trunk,
    _vgg_params_from_torch,
)
from torchsr_tpu.data.preprocess import synthesize_pair
from torchsr_tpu.models.torch_compat import (
    convert_esrgan_discriminator,
    convert_esrgan_generator,
    convert_srgan_discriminator,
    convert_srgan_generator,
)
from torchsr_tpu.train.state import step_lr_schedule

N_PRE_STEPS = 3
N_GAN_STEPS = 2


def test_step_lr_schedule_matches_torch_steplr():
    """Our per-epoch LR values == torch StepLR stepped once per epoch
    (reference srgan/trainer.py:186-195, :528-529), including the decay
    boundaries at multiples of epochs//8 and the epochs<8 degenerate
    step_size=1 case."""
    for total_epochs in (24, 40, 5):
        opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))],
                               lr=LR)
        sched = torch.optim.lr_scheduler.StepLR(
            opt, step_size=max(total_epochs // 8, 1), gamma=0.6
        )
        for epoch in range(1, total_epochs + 1):
            torch_lr = opt.param_groups[0]["lr"]
            ours = step_lr_schedule(LR, epoch, total_epochs)
            np.testing.assert_allclose(
                ours, torch_lr, rtol=1e-12,
                err_msg=f"epoch {epoch}/{total_epochs}",
            )
            sched.step()


def _batch_for_step(step: int):
    """A distinct batch per trajectory step (different content and flip
    pattern), in both frameworks' layouts."""
    rng = np.random.default_rng(1000 + step)
    crops = rng.integers(0, 256, (BATCH, CROP, CROP, 3), dtype=np.uint8)
    flips = rng.random((BATCH, 2)) < 0.5
    lr_np, hr_np = jax.device_get(
        synthesize_pair(crops, flips, upscale_factor=4)
    )
    lr_t = torch.from_numpy(lr_np.transpose(0, 3, 1, 2).copy())
    hr_t = torch.from_numpy(hr_np.transpose(0, 3, 1, 2).copy())
    return crops, flips, lr_t, hr_t


@pytest.mark.slow
@pytest.mark.parametrize("model", ["srgan", "esrgan"])
def test_lockstep_trajectory_matches_reference(model):
    torch.manual_seed(3)
    esrgan = model == "esrgan"
    gen_t = (_TorchESRGANGen() if esrgan else _TorchSRGANGen()).train()
    disc_t = _torch_discriminator(esrgan).train()
    vgg_t = _torch_vgg_trunk().eval()
    convert_gen = (
        convert_esrgan_generator if esrgan else convert_srgan_generator
    )
    convert_disc = (
        convert_esrgan_discriminator if esrgan
        else convert_srgan_discriminator
    )

    trainer = _make_trainer(model)
    vgg_params = _vgg_params_from_torch(vgg_t)

    def sync():
        _install_weights(
            trainer,
            _copy_tree(convert_gen(gen_t.state_dict())),
            _copy_tree(convert_disc(disc_t.state_dict(), image_size=CROP)),
            vgg_params,
        )

    sync()
    psnr_opt = _adam(gen_t.parameters())
    disc_opt = _adam(disc_t.parameters())
    gen_opt = _adam(gen_t.parameters())
    pixel_loss_t = F.l1_loss if esrgan else F.mse_loss

    # ---- phase 1: N lockstep pretrain steps on distinct batches ------
    for step in range(N_PRE_STEPS):
        crops, flips, lr_t, hr_t = _batch_for_step(step)
        sr = gen_t(lr_t)
        t_loss = pixel_loss_t(sr, hr_t)
        psnr_opt.zero_grad()
        t_loss.backward()
        pre_grads = _copy_tree(convert_gen(_grad_sd(gen_t))["params"])
        psnr_opt.step()
        post_gen = _copy_tree(convert_gen(gen_t.state_dict()))

        crops_dev, flips_dev = trainer._put(crops, flips)
        trainer.state, our_loss = trainer.pretrain_step(
            trainer.state, crops_dev, flips_dev
        )
        np.testing.assert_allclose(
            float(our_loss), float(t_loss), rtol=3e-5,
            err_msg=f"pretrain loss, step {step + 1}",
        )
        _assert_tree_close(
            trainer.state.gen_params, post_gen["params"],
            f"pretrain step {step + 1} generator params", atol=2e-5,
            grads=pre_grads, g_thresh=1e-7,
        )
        if post_gen.get("batch_stats"):
            _assert_tree_close(
                trainer.state.gen_stats, post_gen["batch_stats"],
                f"pretrain step {step + 1} generator batch stats",
                atol=1e-4, rtol=1e-4,
            )
        sync()  # params re-synced; Adam moments/step counters are NOT

    # ---- phase 2: N lockstep GAN steps (reference loop math) ---------
    real_label = torch.ones(BATCH, 1)
    fake_label = torch.zeros(BATCH, 1)
    for step in range(N_GAN_STEPS):
        crops, flips, lr_t, hr_t = _batch_for_step(100 + step)

        disc_opt.zero_grad()
        sr = gen_t(lr_t)
        if esrgan:
            real_out = disc_t(hr_t)
            fake_out = disc_t(sr.detach())
            t_disc_loss = (
                F.binary_cross_entropy_with_logits(
                    real_out - fake_out.mean(), real_label)
                + F.binary_cross_entropy_with_logits(
                    fake_out - real_out.mean(), fake_label)
            ) / 2
        else:
            t_disc_loss = (
                F.binary_cross_entropy(disc_t(hr_t), real_label)
                + F.binary_cross_entropy(disc_t(sr.detach()), fake_label)
            )
        t_disc_loss.backward()
        disc_opt.step()

        gen_opt.zero_grad()
        if esrgan:
            sr2 = gen_t(lr_t)
            real_out2 = disc_t(hr_t.detach())
            fake_out2 = disc_t(sr2)
            t_gen_loss = (
                0.01 * F.l1_loss(sr2, hr_t.detach())
                + F.l1_loss(vgg_t(sr2), vgg_t(hr_t.detach()))
                + 0.005 * F.binary_cross_entropy_with_logits(
                    fake_out2 - real_out2.mean(), real_label)
            )
        else:
            t_gen_loss = (
                F.l1_loss(vgg_t(sr), vgg_t(hr_t.detach()))
                + 0.001 * F.binary_cross_entropy(disc_t(sr), real_label)
            )
        t_gen_loss.backward()
        gen_opt.step()

        crops_dev, flips_dev = trainer._put(crops, flips)
        trainer.state, metrics = trainer.gan_step(
            trainer.state, crops_dev, flips_dev, LR, LR,
            trainer.vgg_params,
        )
        np.testing.assert_allclose(
            float(metrics["disc_loss"]), float(t_disc_loss), rtol=1e-4,
            err_msg=f"disc loss, GAN step {step + 1}",
        )
        np.testing.assert_allclose(
            float(metrics["gen_loss"]), float(t_gen_loss), rtol=1e-4,
            err_msg=f"gen loss, GAN step {step + 1}",
        )
        # Running batch stats accumulate across the step's 3-4
        # discriminator forwards; each step starts from synced stats,
        # so this pins the per-step stat sequencing along the sequence.
        final_disc = convert_disc(disc_t.state_dict(), image_size=CROP)
        _assert_tree_close(
            trainer.state.disc_stats, final_disc["batch_stats"],
            f"GAN step {step + 1} discriminator batch stats",
            atol=5e-3, rtol=1e-3,
        )
        sync()
