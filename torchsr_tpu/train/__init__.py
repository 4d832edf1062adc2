"""Training subsystem: functional train steps, losses, metrics, trainers."""

from torchsr_tpu.train.losses import (
    bce_loss,
    bce_with_logits_loss,
    l1_loss,
    mse_loss,
)
from torchsr_tpu.train.metrics import psnr, ssim

__all__ = [
    "mse_loss",
    "l1_loss",
    "bce_loss",
    "bce_with_logits_loss",
    "psnr",
    "ssim",
]
