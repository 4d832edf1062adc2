"""Golden test: converted torchvision-layout VGG19 == torch execution.

Builds a synthetic state dict with torchvision's ``features.{idx}``
naming, runs it through a torch Sequential replica of features[:36] and
through our converted flax VGG19Features, and compares feature maps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from torchsr_tpu.models import VGG19Features
from torchsr_tpu.models.torch_compat import convert_vgg19

CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
       512, 512, 512, 512, "M", 512, 512, 512, 512]


def _build_torch_and_sd():
    torch.manual_seed(0)
    layers = []
    sd = {}
    in_ch = 3
    idx = 0
    for item in CFG:
        if item == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
            idx += 1
            continue
        conv = torch.nn.Conv2d(in_ch, item, 3, padding=1)
        with torch.no_grad():
            conv.weight.mul_(0.1)  # keep activations in range
        sd[f"features.{idx}.weight"] = conv.weight.detach().clone()
        sd[f"features.{idx}.bias"] = conv.bias.detach().clone()
        layers.append(conv)
        layers.append(torch.nn.ReLU(inplace=False))
        idx += 2
        in_ch = item
    return torch.nn.Sequential(*layers), sd


def test_vgg19_conversion_matches_torch():
    model, sd = _build_torch_and_sd()
    model.eval()
    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    variables = convert_vgg19(sd)
    ours = VGG19Features().apply(
        {"params": variables["params"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    assert ours.shape == ref.shape == (1, 2, 2, 512)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)
