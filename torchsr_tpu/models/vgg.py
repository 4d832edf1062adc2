"""VGG19 feature extractor for the perceptual loss, in flax (NHWC).

The reference computes its perceptual ("content") loss as the L1 distance
between VGG19 ``features[:36]`` activations of the generated and target
images (reference srgan/loss.py:28-53, identical in esrgan/loss.py),
feeding *raw [0,1]* pixels without ImageNet normalization — we preserve
that quirk for parity.

``features[:36]`` of torchvision's VGG19 is every layer through
``relu5_4`` (conv5_4 + ReLU) but *excluding* the final maxpool:
blocks of [2, 2, 4, 4, 4] 3x3 convs with ReLU, 2x2/2 maxpool between
blocks, channel widths [64, 128, 256, 512, 512].

Pretrained weights: torchvision's hub file (``vgg19-dcbb9e9d.pth``) can be
converted with :func:`torchsr_tpu.models.torch_compat.convert_vgg19` when
the user supplies it (the Dockerfile in the reference pre-bakes the same
file, Dockerfile:11).  With no weight file available (this machine has no
network egress), a deterministic He-normal initialization is used — the
loss remains a valid multi-scale feature distance (random-feature
perceptual losses are a known-functional fallback) and the full training
path stays runnable; swap in converted weights for publication-grade
perceptual quality.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from torchsr_tpu.models.layers import Conv

# Channel widths per conv, 'M' = 2x2/2 maxpool.  Truncated at relu5_4
# (torchvision features[:36]).
VGG19_CFG_36 = [
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512,
]

_he_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class VGG19Features(nn.Module):
    """VGG19 trunk through relu5_4; returns the final feature map (NHWC).

    ``max_convs`` truncates the trunk to the first N convolutions —
    useful for fast tests; None = the full features[:36] trunk.
    """

    dtype: Any = None
    max_convs: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = self.dtype or jnp.float32
        out = x.astype(dtype)
        conv_idx = 0
        for item in VGG19_CFG_36:
            if self.max_convs is not None and conv_idx >= self.max_convs:
                break
            if item == "M":
                out = nn.max_pool(out, (2, 2), strides=(2, 2))
            else:
                out = Conv(
                    item, (3, 3), dtype=self.dtype,
                    kernel_init=_he_normal,
                    name=f"conv{conv_idx}",
                )(out)
                out = nn.relu(out)
                conv_idx += 1
        return out
