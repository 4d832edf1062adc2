"""Step-level numerical parity with the reference trainer math.

The strongest feasible "the trainer matches" proof: torch replicas of
the reference networks are wired with the reference's EXACT loss and
optimizer recipe (SRGAN: /root/reference/torchsr/srgan/trainer.py:
163-196, :382-388, :444-469; ESRGAN: esrgan/trainer.py:163-196,
:444-484, Adam trio lr=1e-4), run ONE pretrain step and ONE GAN step
from converted identical weights on an identical batch, and the losses,
updated generator/discriminator parameters, and BatchNorm running
statistics are asserted against our jitted ``pretrain_step``/``gan_step``
executing the same batch.

This pins, end to end:
  * disc-update-before-gen-update sequencing (the gen loss sees the
    UPDATED discriminator);
  * ``.detach()`` -> ``stop_gradient`` placement (sr detached in the
    disc loss, hr detached in the gen loss);
  * the relativistic-average mean terms (gradients flow through BOTH
    branches of ``D(x) - mean(D(y))``);
  * BN batch-stat sequencing across the step's 3 (SRGAN) / 4 (ESRGAN)
    discriminator forwards, incl. torch's unbiased running-var update;
  * the saved-vjp generator gradient (SRGAN, one forward) being
    value-identical to the reference's recomputed second forward;
  * Adam bias correction / eps placement vs torch.

Everything runs in float32 (AMP off) so differences are pure math, not
precision policy.
"""


from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

from tests.test_esrgan_parity import _TorchESRGANGen
from tests.test_reference_parity import _TorchSRGANGen
from torchsr_tpu.data.preprocess import synthesize_pair
from torchsr_tpu.data.synthetic import (
    SyntheticEvalLoader,
    SyntheticTrainLoader,
)
from torchsr_tpu.models import (
    ESRGANDiscriminator,
    SRGANDiscriminator,
)
from torchsr_tpu.models.torch_compat import (
    convert_esrgan_discriminator,
    convert_esrgan_generator,
    convert_srgan_discriminator,
    convert_srgan_generator,
)
from torchsr_tpu.parallel.mesh import (
    DistributedContext,
    make_mesh,
    replicate,
)
from torchsr_tpu.train.trainer import (
    ESRGANTrainer,
    SRGANTrainer,
    _match_tree,
)

BATCH = 4
CROP = 32
LR = 1e-4
N_VGG_CONVS = 2


def _torch_discriminator(esrgan: bool) -> tnn.Module:
    """Reference-layout discriminator (nn.Sequential 'features' +
    'classifier' naming, srgan/discriminator.py:31-69 /
    esrgan/discriminator.py:31-76) so the converters apply directly."""
    stages = [
        (64, 1, False), (64, 2, True), (128, 1, True), (128, 2, True),
        (256, 1, True), (256, 2, True), (512, 1, True), (512, 2, True),
    ]
    if esrgan:
        stages += [(512, 1, True), (512, 2, True)]
    layers: list = []
    in_ch = 3
    for feat, stride, use_bn in stages:
        layers.append(
            tnn.Conv2d(in_ch, feat, 3, stride=stride, padding=1,
                       bias=not use_bn)
        )
        if use_bn:
            layers.append(tnn.BatchNorm2d(feat))
        layers.append(tnn.LeakyReLU(0.2))
        in_ch = feat
    features = tnn.Sequential(*layers)
    fm = CROP // (32 if esrgan else 16)
    if esrgan:
        classifier = tnn.Sequential(
            tnn.Linear(512 * fm * fm, 100), tnn.LeakyReLU(0.2),
            tnn.Linear(100, 1),
        )
    else:
        classifier = tnn.Sequential(
            tnn.Linear(512 * fm * fm, 1024), tnn.LeakyReLU(0.2),
            tnn.Linear(1024, 1), tnn.Sigmoid(),
        )

    class _Disc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.classifier = classifier

        def forward(self, x):
            out = self.features(x)
            return self.classifier(torch.flatten(out, 1))

    return _Disc()


def _torch_vgg_trunk() -> tnn.Sequential:
    """First N_VGG_CONVS convs of VGG19 features (conv-relu chain)."""
    torch.manual_seed(11)
    convs = []
    in_ch = 3
    for _ in range(N_VGG_CONVS):
        conv = tnn.Conv2d(in_ch, 64, 3, padding=1)
        with torch.no_grad():
            conv.weight.mul_(0.2)  # keep feature magnitudes moderate
        convs += [conv, tnn.ReLU()]
        in_ch = 64
    return tnn.Sequential(*convs)


def _vgg_params_from_torch(vgg_t: tnn.Sequential) -> dict:
    params = {}
    i = 0
    for mod in vgg_t:
        if isinstance(mod, tnn.Conv2d):
            params[f"conv{i}"] = {"conv": {
                "kernel": mod.weight.detach().numpy()
                .transpose(2, 3, 1, 0).copy(),
                "bias": mod.bias.detach().numpy().copy(),
            }}
            i += 1
    return params


def _make_trainer(model: str):
    args = Namespace(
        batch_size=BATCH, disable_amp=True, epochs=1, pretrain_epochs=1,
        gan_checkpoint=None, psnr_checkpoint=None, seed=0,
        skip_image_save=True, model=model, num_residual=N_BLOCKS[model],
        vgg_convs=N_VGG_CONVS,
    )
    train_loader = SyntheticTrainLoader(BATCH, CROP, n_batches=1)
    eval_loader = SyntheticEvalLoader(BATCH, CROP, n_batches=1)
    mesh = make_mesh(num_devices=1)
    ctx = DistributedContext(1, -1, -1, 1, False)
    cls = SRGANTrainer if model == "srgan" else ESRGANTrainer
    return cls(args, train_loader, eval_loader,
               train_loader.dataset_len, eval_loader.dataset_len,
               mesh, ctx)


N_BLOCKS = {"srgan": 2, "esrgan": 2}


def _install_weights(trainer, gen_vars, disc_vars, vgg_params):
    host = jax.device_get(trainer.state)
    updates = {
        "gen_params": _match_tree(host.gen_params, gen_vars["params"]),
        "disc_params": _match_tree(host.disc_params, disc_vars["params"]),
        "disc_stats": _match_tree(
            host.disc_stats, disc_vars["batch_stats"]
        ),
    }
    if gen_vars.get("batch_stats"):
        updates["gen_stats"] = _match_tree(
            host.gen_stats, gen_vars["batch_stats"]
        )
    trainer.state = replicate(host.replace(**updates), trainer.mesh)
    trainer.vgg_params = replicate(
        _match_tree(jax.device_get(trainer.vgg_params), vgg_params),
        trainer.mesh,
    )


def _assert_tree_close(ours, theirs, what, atol, rtol=1e-3,
                       grads=None, g_thresh=1e-6,
                       noise_grads=None, noise_frac=0.15):
    """Per-leaf allclose with path-labeled errors.

    ``grads`` (torch's gradients in our tree layout) handles Adam's
    near-zero-gradient ambiguity: the update is ~lr*g/(|g|+eps), a
    sign-like function of g, so an element whose gradient sits inside
    the cross-framework fp-noise band takes a +-lr "coin flip" step
    decided by that noise.  Every element with a DECISIVE gradient must
    meet atol/rtol; ambiguous elements are only bounded by two opposite
    full Adam steps (2*lr) and may not exceed 10% of a tensor.

    The noise band per tensor is ``max(g_thresh, noise_frac *
    max|noise_grads|)``.  ``noise_grads`` models ill-conditioned
    gradient paths.  Two measured sources: (a) the discriminator's
    train-mode BN backward subtracts near-equal mean terms, compounding
    relative fp error to ~0.5% over 9-10 layers (the forward agrees to
    ~1e-6); (b) the disc update preceding the gen update contains its
    own legitimate +-lr near-zero-grad coin flips, and the gen gradient
    flowing through that slightly-different disc picks up up to ~10% of
    the adversarial component's magnitude (with a fully SYNCED disc the
    same gen gradients agree to 2e-7).  For the GAN generator update
    the band therefore scales with the (loss-weighted) adversarial
    component's per-tensor magnitude; the well-conditioned
    pixel/content components keep the comparison tight wherever they
    dominate.
    """
    matched = _match_tree(jax.device_get(ours), theirs)
    grads_m = (
        _match_tree(jax.device_get(ours), grads)
        if grads is not None else None
    )
    noise_m = (
        _match_tree(jax.device_get(ours), noise_grads)
        if noise_grads is not None else None
    )
    for idx, ((path_a, a), (_path_b, b)) in enumerate(zip(
        jax.tree_util.tree_flatten_with_path(jax.device_get(ours))[0],
        jax.tree_util.tree_flatten_with_path(matched)[0],
    )):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        where = f"{what} diverged at {jax.tree_util.keystr(path_a)}"
        diff = np.abs(a - b)
        bad = diff > (atol + rtol * np.abs(b))
        if not bad.any():
            continue
        if grads_m is not None:
            g = np.abs(np.asarray(
                jax.tree_util.tree_flatten_with_path(grads_m)[0][idx][1],
                np.float64,
            ))
            thresh = g_thresh
            if noise_m is not None:
                n = np.abs(np.asarray(
                    jax.tree_util.tree_flatten_with_path(noise_m)[0]
                    [idx][1],
                    np.float64,
                ))
                thresh = max(g_thresh, noise_frac * float(n.max()))
            decisive_bad = bad & (g >= thresh)
            assert not decisive_bad.any(), (
                f"{where}: {int(decisive_bad.sum())}/{a.size} elements "
                f"with decisive gradients (|g|>={thresh:.1e}, min bad "
                f"|g|={g[decisive_bad].min() if decisive_bad.any() else 0:.2e}, "
                f"max |diff|={diff[decisive_bad].max() if decisive_bad.any() else 0:.2e}) "
                f"beyond tolerance — a real math mismatch"
            )
            assert float(diff.max()) <= 2.1 * LR, (
                f"{where}: max |diff| {diff.max():.3e} exceeds two "
                f"opposite full Adam steps"
            )
            # Tiny tensors can be entirely ambiguous (e.g. the ESRGAN
            # disc fc2 bias, whose gradient is ANALYTICALLY zero: a
            # uniform logit shift cancels in every relativistic
            # D(x)-mean(D(y)) difference), so allow a small absolute
            # count as well as the fraction cap.
            assert float(bad.mean()) < 0.10 or int(bad.sum()) <= 4, (
                f"{where}: {int(bad.sum())}/{a.size} ambiguous-gradient "
                f"flips — too many to be fp noise"
            )
        else:
            np.testing.assert_allclose(
                a, b, atol=atol, rtol=rtol, err_msg=where
            )


def _batch():
    rng = np.random.default_rng(42)
    crops = rng.integers(0, 256, (BATCH, CROP, CROP, 3), dtype=np.uint8)
    flips = np.zeros((BATCH, 2), dtype=bool)
    flips[1, 0] = True
    flips[2, 1] = True
    lr_np, hr_np = jax.device_get(
        synthesize_pair(crops, flips, upscale_factor=4)
    )
    lr_t = torch.from_numpy(lr_np.transpose(0, 3, 1, 2).copy())
    hr_t = torch.from_numpy(hr_np.transpose(0, 3, 1, 2).copy())
    return crops, flips, lr_t, hr_t


def _adam(params):
    return torch.optim.Adam(params, lr=LR, betas=(0.9, 0.999))


def _copy_tree(tree):
    """Deep-copy array leaves: the torch->flax converters can alias
    torch parameter memory, which the in-place Adam steps would mutate."""
    return jax.tree.map(lambda a: np.array(a), tree)


def _grad_sd(module: tnn.Module) -> dict:
    """state_dict-shaped dict holding parameter GRADIENTS (buffers keep
    their values so the regular converters apply; only the ['params']
    part of the result is meaningful)."""
    sd = {k: v.detach().clone() for k, v in module.state_dict().items()}
    for name, p in module.named_parameters():
        sd[name] = (
            p.grad.detach().clone() if p.grad is not None
            else torch.zeros_like(p)
        )
    return sd


@pytest.mark.slow
@pytest.mark.parametrize("model", ["srgan", "esrgan"])
def test_one_pretrain_and_one_gan_step_match_reference_math(model):
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
    init_gen_vars = _copy_tree(convert_gen(gen_t.state_dict()))
    init_disc_vars = _copy_tree(
        convert_disc(disc_t.state_dict(), image_size=CROP)
    )
    vgg_params = _vgg_params_from_torch(vgg_t)
    _install_weights(trainer, init_gen_vars, init_disc_vars, vgg_params)

    crops, flips, lr_t, hr_t = _batch()

    # ---- torch side: the reference's exact step math -----------------
    psnr_opt = _adam(gen_t.parameters())
    disc_opt = _adam(disc_t.parameters())
    gen_opt = _adam(gen_t.parameters())
    pixel_loss_t = F.l1_loss if esrgan else F.mse_loss

    # pretrain step (srgan/trainer.py:382-388 sans AMP)
    sr = gen_t(lr_t)
    t_pre_loss = pixel_loss_t(sr, hr_t)
    psnr_opt.zero_grad()
    t_pre_loss.backward()
    pre_grads = _copy_tree(convert_gen(_grad_sd(gen_t))["params"])
    psnr_opt.step()
    post_pre_gen = _copy_tree(convert_gen(gen_t.state_dict()))

    # GAN step
    real_label = torch.ones(BATCH, 1)
    fake_label = torch.zeros(BATCH, 1)
    disc_opt.zero_grad()
    sr = gen_t(lr_t)
    if esrgan:
        # esrgan/trainer.py:446-453 (relativistic average, mean terms
        # NOT detached)
        real_out = disc_t(hr_t)
        fake_out = disc_t(sr.detach())
        t_disc_loss = (
            F.binary_cross_entropy_with_logits(
                real_out - fake_out.mean(), real_label)
            + F.binary_cross_entropy_with_logits(
                fake_out - real_out.mean(), fake_label)
        ) / 2
    else:
        # srgan/trainer.py:446-448
        t_disc_loss = (
            F.binary_cross_entropy(disc_t(hr_t), real_label)
            + F.binary_cross_entropy(disc_t(sr.detach()), fake_label)
        )
    t_disc_loss.backward()
    disc_grads = _copy_tree(
        convert_disc(_grad_sd(disc_t), image_size=CROP)["params"]
    )
    disc_opt.step()

    gen_opt.zero_grad()
    if esrgan:
        # esrgan/trainer.py:461-469: generator forward runs AGAIN
        sr2 = gen_t(lr_t)
        real_out2 = disc_t(hr_t.detach())
        fake_out2 = disc_t(sr2)
        t_adv = 0.005 * F.binary_cross_entropy_with_logits(
            fake_out2 - real_out2.mean(), real_label)
        t_gen_loss = (
            0.01 * F.l1_loss(sr2, hr_t.detach())
            + F.l1_loss(vgg_t(sr2), vgg_t(hr_t.detach()))
            + t_adv
        )
    else:
        # srgan/trainer.py:455-457: reuses the SAME sr graph
        t_adv = 0.001 * F.binary_cross_entropy(disc_t(sr), real_label)
        t_gen_loss = (
            F.l1_loss(vgg_t(sr), vgg_t(hr_t.detach())) + t_adv
        )
    # The weighted adversarial component alone, used as the noise scale
    # for the param comparison (see _assert_tree_close).
    t_adv.backward(retain_graph=True)
    adv_grads = _copy_tree(convert_gen(_grad_sd(gen_t))["params"])
    gen_opt.zero_grad()
    t_gen_loss.backward()
    gen_grads = _copy_tree(convert_gen(_grad_sd(gen_t))["params"])
    gen_opt.step()

    # ---- our side: the jitted steps on the same batch ----------------
    crops_dev, flips_dev = trainer._put(crops, flips)
    trainer.state, our_pre_loss = trainer.pretrain_step(
        trainer.state, crops_dev, flips_dev
    )
    post_pre_params = trainer.state.gen_params
    post_pre_stats = trainer.state.gen_stats
    # Re-sync to torch's post-pretrain state before the GAN step so the
    # GAN-step comparison is single-step-from-identical-state.  Without
    # this, the ~1e-6 post-pretrain param differences amplify
    # chaotically: the GAN phase's content grads are tiny (~1e-5) and
    # Adam's g/(|g|+eps) normalization turns small relative gradient
    # perturbations into opposite-direction full steps for ~1% of
    # elements — divergence growth, not math mismatch (losses and raw
    # gradients agree to ~1e-9 at equal inputs).
    _install_weights(trainer, post_pre_gen, init_disc_vars, vgg_params)
    crops_dev, flips_dev = trainer._put(crops, flips)
    trainer.state, metrics = trainer.gan_step(
        trainer.state, crops_dev, flips_dev, LR, LR, trainer.vgg_params
    )

    # ---- compare ------------------------------------------------------
    np.testing.assert_allclose(
        float(our_pre_loss), float(t_pre_loss), rtol=2e-5,
        err_msg="pretrain loss",
    )
    _assert_tree_close(
        post_pre_params, post_pre_gen["params"],
        "post-pretrain generator params", atol=2e-5, grads=pre_grads,
        g_thresh=1e-7,
    )
    if post_pre_gen.get("batch_stats"):
        _assert_tree_close(
            post_pre_stats, post_pre_gen["batch_stats"],
            "post-pretrain generator batch stats", atol=1e-4, rtol=1e-4,
        )
    np.testing.assert_allclose(
        float(metrics["disc_loss"]), float(t_disc_loss), rtol=5e-5,
        err_msg="disc loss",
    )
    np.testing.assert_allclose(
        float(metrics["gen_loss"]), float(t_gen_loss), rtol=5e-5,
        err_msg="gen loss",
    )

    final_gen = convert_gen(gen_t.state_dict())
    final_disc = convert_disc(disc_t.state_dict(), image_size=CROP)
    # Updated params moved by <= ~2*lr/element (two Adam steps); near-
    # zero-gradient elements amplify fp noise through Adam's
    # g/(|g|+eps), hence the atol in units of lr.
    _assert_tree_close(
        trainer.state.gen_params, final_gen["params"],
        "generator params", atol=2e-5, grads=gen_grads,
        noise_grads=adv_grads,
    )
    _assert_tree_close(
        trainer.state.disc_params, final_disc["params"],
        "discriminator params", atol=2e-5, grads=disc_grads,
        noise_grads=disc_grads, noise_frac=0.01,
    )
    # Looser than the gen stats: the gen-phase disc forwards run with
    # the UPDATED disc, whose isolated near-zero-grad weights
    # legitimately land +-lr apart between frameworks, shifting deep
    # activations (and hence the running batch stats) by up to ~1e-3.
    _assert_tree_close(
        trainer.state.disc_stats, final_disc["batch_stats"],
        "discriminator batch stats", atol=5e-3, rtol=1e-3,
    )
    if final_gen.get("batch_stats"):
        _assert_tree_close(
            trainer.state.gen_stats, final_gen["batch_stats"],
            "generator batch stats", atol=1e-4, rtol=1e-4,
        )


@pytest.mark.parametrize("model", ["srgan", "esrgan"])
def test_discriminator_forward_parity(model):
    """Converted torch discriminator weights produce identical outputs.

    Exercises EVEN input sizes through the stride-2 convs: torch pads
    (1,1) symmetrically there, which our Conv reproduces with explicit
    padding (XLA "SAME" would pad (0,1) — a one-pixel-shifted, different
    convolution).  Covers train mode (batch stats) and eval mode
    (running stats), plus the CHW->HWC flatten permutation into fc1.
    """
    esrgan = model == "esrgan"
    torch.manual_seed(9)
    disc_t = _torch_discriminator(esrgan)
    # non-trivial running stats so eval mode is actually exercised
    gen = np.random.default_rng(1)
    with torch.no_grad():
        for mod in disc_t.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                c = mod.running_mean.numel()
                mod.running_mean.copy_(torch.from_numpy(
                    gen.standard_normal(c).astype(np.float32) * 0.1))
                mod.running_var.copy_(torch.from_numpy(
                    (0.5 + gen.random(c)).astype(np.float32)))
    convert = (
        convert_esrgan_discriminator if esrgan
        else convert_srgan_discriminator
    )
    dvars = _copy_tree(convert(disc_t.state_dict(), image_size=CROP))
    disc_j = (
        ESRGANDiscriminator(image_size=CROP) if esrgan
        else SRGANDiscriminator(image_size=CROP)
    )
    x = gen.random((2, CROP, CROP, 3)).astype(np.float32)
    x_t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())

    disc_t.train()
    with torch.no_grad():
        ref_train = disc_t(x_t).numpy()
    ours_train, _ = disc_j.apply(
        {"params": dvars["params"], "batch_stats": dvars["batch_stats"]},
        jnp.asarray(x), train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(ours_train), ref_train, atol=5e-5, rtol=1e-4
    )

    disc_t.eval()
    with torch.no_grad():
        ref_eval = disc_t(x_t).numpy()
    # eval uses the running stats as UPDATED by the torch train forward
    dvars2 = _copy_tree(convert(disc_t.state_dict(), image_size=CROP))
    ours_eval = disc_j.apply(
        {"params": dvars2["params"],
         "batch_stats": dvars2["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours_eval), ref_eval, atol=5e-5, rtol=1e-4
    )
