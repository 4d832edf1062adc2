"""Model registry: name -> trainer class / generator / crop size.

API parity with the reference registry (/root/reference/torchsr/models.py:
10-83): case-insensitive lookup, ``RuntimeError`` listing the supported
keys on a miss.
"""

from __future__ import annotations

from argparse import Namespace


def _models() -> dict:
    # Imported lazily so `torchsr test` doesn't pay trainer import cost.
    from torchsr_tpu.train.trainer import ESRGANTrainer, SRGANTrainer

    return {"esrgan": ESRGANTrainer, "srgan": SRGANTrainer}


def _generators() -> dict:
    from torchsr_tpu.models import ESRGANGenerator, SRGANGenerator

    return {"esrgan": ESRGANGenerator, "srgan": SRGANGenerator}


MODEL_NAMES = ("esrgan", "srgan")

CROP_SIZE = {
    "esrgan": 128,
    "srgan": 96,
}


def select_trainer_model(args: Namespace) -> tuple[type, int]:
    """Return (trainer class, crop size) for the requested model."""
    name = args.model.lower()
    models = _models()
    if name in models:
        return models[name], CROP_SIZE[name]
    raise RuntimeError(
        f"{args.model} not supported. Please choose from: "
        f"{list(models.keys())}"
    )


def select_test_model(args: Namespace) -> type:
    """Return the generator class for the requested model."""
    name = args.model.lower()
    generators = _generators()
    if name in generators:
        return generators[name]
    raise RuntimeError(
        f"{args.model} not supported. Please choose from: "
        f"{list(generators.keys())}"
    )
