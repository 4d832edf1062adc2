"""Data pipeline: host-side decode/crop feeding fused on-device preprocessing.

TPU-first redesign of the reference's PIL/torchvision pipeline
(/root/reference/torchsr/dataset.py): the host does only what must stay on
the host (image decode and uint8 random-crop slicing — zero FLOPs), and
everything with arithmetic in it (normalize, flips, antialiased bicubic
downscale to synthesize the LR pair) runs on device, batched and jitted,
with the downscale expressed as two MXU matmuls.
"""

from torchsr_tpu.data.discovery import discover_images, split_dataset
from torchsr_tpu.data.loader import EvalLoader, TrainLoader, initialize_datasets
from torchsr_tpu.data.preprocess import (
    make_eval_preprocess,
    make_train_preprocess,
)

__all__ = [
    "discover_images",
    "split_dataset",
    "TrainLoader",
    "EvalLoader",
    "initialize_datasets",
    "make_train_preprocess",
    "make_eval_preprocess",
]
