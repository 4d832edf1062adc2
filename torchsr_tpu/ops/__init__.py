"""TPU-native compute ops for torchsr-tpu.

Hot ops are expressed so XLA can map them onto the MXU (matmul-based
separable resampling) or fuse them on the VPU (elementwise epilogues);
Pallas kernels live under ``torchsr_tpu.ops.pallas``.
"""

from torchsr_tpu.ops.pixel_shuffle import depth_to_space, space_to_depth
from torchsr_tpu.ops.resize import (
    bicubic_resize,
    nearest_upsample,
    resample_matrix,
)

__all__ = [
    "bicubic_resize",
    "nearest_upsample",
    "resample_matrix",
    "depth_to_space",
    "space_to_depth",
]
