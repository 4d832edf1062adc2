"""Dataset discovery and train/test splitting.

Parity with the reference's ``_image_dataset`` + ``train_test_split``
(reference dataset.py:32-52, :411-413) with one deliberate fix: the
reference's split is *unseeded and recomputed per process*, so in
distributed runs every rank gets a different 90/10 split (train images
leak into other ranks' eval sets).  Here the split is a deterministic
function of the seed, identical on every host.
"""

from __future__ import annotations

import os

import numpy as np

from torchsr_tpu.constants import SUPPORTED_IMAGES


def discover_images(directory: str) -> list[str]:
    """List supported images (.jpg/.jpeg/.png) in ``directory``, sorted.

    Sorted so the downstream seeded split is reproducible across
    machines regardless of filesystem enumeration order.
    """
    if not os.path.isdir(directory):
        raise FileNotFoundError(
            f"training directory not found: {directory!r}"
        )
    images = [
        os.path.join(directory, fn)
        for fn in sorted(os.listdir(directory))
        if fn.lower().endswith(SUPPORTED_IMAGES)
    ]
    return images


def split_dataset(
    images: list[str],
    test_fraction: float = 0.1,
    seed: int = 0,
) -> tuple[list[str], list[str]]:
    """Shuffled 90/10 train/test split, deterministic in ``seed``.

    Matches the reference's ``train_test_split(test_size=0.1,
    shuffle=True)`` semantics (test set size = ceil(n * fraction)).
    """
    if not images:
        raise ValueError("no supported images found in the dataset directory")
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(images))
    n_test = max(1, int(np.ceil(len(images) * test_fraction)))
    test_idx = set(perm[:n_test].tolist())
    train = [img for i, img in enumerate(images) if i not in test_idx]
    test = [img for i, img in enumerate(images) if i in test_idx]
    if not train:
        raise ValueError(
            "dataset too small: train split is empty after the 90/10 split"
        )
    return train, test
