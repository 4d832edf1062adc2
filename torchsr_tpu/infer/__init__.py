"""Inference: single-shot, tiled, mesh-sharded tiled, spatially-
sharded halo-exchange upscaling, StableHLO serving artifacts, and the
HTTP serving daemon."""

from torchsr_tpu.infer.halo import halo_upscale, make_spatial_mesh
from torchsr_tpu.infer.multichip import tiled_upscale_sharded
from torchsr_tpu.infer.server import (
    CheckpointUpscaleService,
    UpscaleService,
    make_server,
)
from torchsr_tpu.infer.serving import (
    ServedGenerator,
    export_generator_artifact,
)
from torchsr_tpu.infer.tiled import tiled_upscale, upscale_image

__all__ = [
    "tiled_upscale",
    "upscale_image",
    "tiled_upscale_sharded",
    "halo_upscale",
    "make_spatial_mesh",
    "ServedGenerator",
    "export_generator_artifact",
    "CheckpointUpscaleService",
    "UpscaleService",
    "make_server",
]
