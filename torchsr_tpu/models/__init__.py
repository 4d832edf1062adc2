"""Model zoo: SRGAN and ESRGAN generators/discriminators plus VGG19.

All modules are flax.linen, NHWC layout, with a configurable compute dtype
(bfloat16 by default in training — the TPU-native replacement for the
reference's CUDA AMP; parameters stay float32).
"""

from torchsr_tpu.models.esrgan import (
    ESRGANDiscriminator,
    ESRGANGenerator,
)
from torchsr_tpu.models.srgan import (
    SRGANDiscriminator,
    SRGANGenerator,
)
from torchsr_tpu.models.vgg import VGG19Features

__all__ = [
    "SRGANGenerator",
    "SRGANDiscriminator",
    "ESRGANGenerator",
    "ESRGANDiscriminator",
    "VGG19Features",
]
