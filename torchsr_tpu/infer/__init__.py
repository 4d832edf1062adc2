"""Inference: single-shot, tiled, and mesh-sharded tiled upscaling."""

from torchsr_tpu.infer.multichip import tiled_upscale_sharded
from torchsr_tpu.infer.tiled import tiled_upscale, upscale_image

__all__ = ["tiled_upscale", "upscale_image", "tiled_upscale_sharded"]
