"""torchsr-tpu: a TPU-native super-resolution training and inference framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
TorchSR application (SRGAN + ESRGAN 4x super resolution; see
/root/reference/torchsr): two-phase GAN training (PSNR pretrain followed by
adversarial training), a fused on-device data pipeline, data-parallel
training over a `jax.sharding.Mesh`, best/latest checkpointing with
torch-checkpoint compatibility, PSNR/SSIM evaluation, and tiled
overlap-blend inference for arbitrary-size images.

Design stance (TPU-first, not a port):
  * NHWC layout everywhere; convolutions hit the MXU via XLA.
  * Functional core: pure jitted ``train_step(state, batch) -> state, metrics``.
  * bfloat16 compute policy replaces CUDA AMP (no GradScaler needed).
  * `depth_to_space` replaces PixelShuffle; matmul-based separable bicubic
    resize replaces the PIL resampling path, on device.
  * Data parallelism via sharding annotations on a Mesh (XLA inserts the
    psum over ICI) instead of NCCL/DDP.
"""

from torchsr_tpu.__version__ import VERSION

__version__ = VERSION

__all__ = ["VERSION", "__version__"]
