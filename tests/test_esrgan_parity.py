"""Numeric parity: ESRGAN generator vs torch execution with shared weights.

Same methodology as tests/test_reference_parity.py, for the RRDB
generator: dense-concat growth ordering, residual scaling, nearest
upsample, and LeakyReLU all must agree with the torch reference
architecture for converted checkpoints to be usable.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn as tnn

from torchsr_tpu.models import ESRGANGenerator
from torchsr_tpu.models.torch_compat import convert_esrgan_generator

N_BLOCKS = 2


class _TorchRDB(tnn.Module):
    def __init__(self):
        super().__init__()
        for i in range(1, 5):
            seq = tnn.Sequential(
                tnn.Conv2d(64 + (i - 1) * 32, 32, 3, padding=1),
                tnn.LeakyReLU(0.2),
            )
            setattr(self, f"conv{i}", seq)
        self.conv5 = tnn.Conv2d(64 + 4 * 32, 64, 3, padding=1)

    def forward(self, x):
        feats = [x]
        for i in range(1, 5):
            out = getattr(self, f"conv{i}")(torch.cat(feats, dim=1))
            feats.append(out)
        return self.conv5(torch.cat(feats, dim=1)) * 0.2 + x


class _TorchRRDB(tnn.Module):
    def __init__(self):
        super().__init__()
        self.RDB1 = _TorchRDB()
        self.RDB2 = _TorchRDB()
        self.RDB3 = _TorchRDB()

    def forward(self, x):
        return self.RDB3(self.RDB2(self.RDB1(x))) * 0.2 + x


class _TorchESRGANGen(tnn.Module):
    """Reference-architecture ESRGAN generator (state_dict layout
    matches the reference so the converter applies directly)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, padding=1)
        self.blocks = tnn.Sequential(
            *[_TorchRRDB() for _ in range(N_BLOCKS)]
        )
        self.conv2 = tnn.Conv2d(64, 64, 3, padding=1)
        self.upsample1 = tnn.Conv2d(64, 64, 3, padding=1)
        self.upsample2 = tnn.Conv2d(64, 64, 3, padding=1)
        self.conv3 = tnn.Sequential(
            tnn.Conv2d(64, 64, 3, padding=1), tnn.LeakyReLU(0.2)
        )
        self.conv4 = tnn.Conv2d(64, 3, 3, padding=1)

    def forward(self, x):
        c1 = self.conv1(x)
        out = self.conv2(self.blocks(c1)) + c1
        out = F.leaky_relu(
            self.upsample1(F.interpolate(out, scale_factor=2,
                                         mode="nearest")), 0.2)
        out = F.leaky_relu(
            self.upsample2(F.interpolate(out, scale_factor=2,
                                         mode="nearest")), 0.2)
        return self.conv4(self.conv3(out))


def test_esrgan_generator_numeric_parity():
    torch.manual_seed(0)
    model = _TorchESRGANGen().eval()
    # scale weights down so deep dense blocks stay in range
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(0.1)

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 10, 10)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    variables = convert_esrgan_generator(model.state_dict())
    gen = ESRGANGenerator(num_rrdb_blocks=N_BLOCKS)
    ours = gen.apply(
        {"params": variables["params"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert ours.shape == ref.shape == (1, 40, 40, 3)
    np.testing.assert_allclose(
        np.asarray(ours), ref, atol=2e-5, rtol=1e-4
    )
