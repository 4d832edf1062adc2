"""Inference: single-shot and tiled overlap-blend upscaling."""

from torchsr_tpu.infer.tiled import tiled_upscale, upscale_image

__all__ = ["tiled_upscale", "upscale_image"]
