"""Numeric parity: converted torch weights produce identical outputs.

Builds the SRGAN generator architecture in torch (from its published
description: conv9+PReLU, N x [conv3-BN-PReLU-conv3-BN + skip],
conv3+BN, long skip, subpixel x2 stages, conv9), runs random weights
through both frameworks, and compares eval-mode outputs.  This pins the
whole conversion chain: OIHW->HWIO, PixelShuffle ordering, BN
eps/momentum semantics, PReLU broadcasting.
"""

import jax.numpy as jnp
import numpy as np
import torch
from torch import nn as tnn

from torchsr_tpu.models import SRGANGenerator
from torchsr_tpu.models.torch_compat import convert_srgan_generator

N_BLOCKS = 2


class _TorchResBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(64, 64, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.prelu = tnn.PReLU()
        self.conv2 = tnn.Conv2d(64, 64, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)

    def forward(self, x):
        y = self.bn1(self.conv1(x))
        y = self.prelu(y)
        y = self.bn2(self.conv2(y))
        return y + x


class _TorchSubpixel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = tnn.Conv2d(64, 256, 3, padding=1)
        self.prelu = tnn.PReLU()

    def forward(self, x):
        return self.prelu(torch.pixel_shuffle(self.conv(x), 2))


class _TorchSRGANGen(tnn.Module):
    """Reference-architecture SRGAN generator (module names match the
    reference state_dict layout so the converter applies directly)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(3, 64, 9, padding=4), tnn.PReLU()
        )
        self.blocks = tnn.Sequential(
            *[_TorchResBlock() for _ in range(N_BLOCKS)]
        )
        self.conv2 = tnn.Sequential(
            tnn.Conv2d(64, 64, 3, padding=1, bias=False),
            tnn.BatchNorm2d(64),
        )
        self.conv_layers = tnn.Sequential(
            _TorchSubpixel(), _TorchSubpixel()
        )
        self.conv3 = tnn.Conv2d(64, 3, 9, padding=4)

    def forward(self, x):
        c1 = self.conv1(x)
        out = self.conv2(self.blocks(c1)) + c1
        return self.conv3(self.conv_layers(out))


def _randomize_bn_stats(model, rng):
    # Non-trivial running stats so eval-mode BN is actually exercised.
    for mod in model.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.copy_(
                torch.from_numpy(
                    rng.standard_normal(64).astype(np.float32) * 0.1
                )
            )
            mod.running_var.copy_(
                torch.from_numpy(
                    (0.5 + rng.random(64)).astype(np.float32)
                )
            )


def test_srgan_generator_numeric_parity():
    torch.manual_seed(0)
    model = _TorchSRGANGen().eval()
    rng = np.random.default_rng(0)
    with torch.no_grad():
        _randomize_bn_stats(model, rng)

    x = rng.random((2, 3, 12, 12)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    variables = convert_srgan_generator(model.state_dict())
    gen = SRGANGenerator(num_residual=N_BLOCKS)
    ours = gen.apply(
        {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        },
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert ours.shape == ref.shape == (2, 48, 48, 3)
    np.testing.assert_allclose(
        np.asarray(ours), ref, atol=2e-4, rtol=1e-3
    )
