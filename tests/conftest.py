"""Test configuration: force CPU with a virtual 8-device mesh.

Must run before jax is imported anywhere — pytest imports conftest first.
This is the JAX-native 'fake backend' for multi-device testing without a
real TPU slice (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin overrides JAX_PLATFORMS; the explicit
# config knob takes precedence over both.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="session")
def image_dir(tmp_path_factory):
    """A tiny synthetic dataset directory of RGB images."""
    root = tmp_path_factory.mktemp("images")
    rng = np.random.default_rng(0)
    for i in range(12):
        h = int(rng.integers(64, 97))
        w = int(rng.integers(64, 97))
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i:02d}.png")
    return str(root)


@pytest.fixture(scope="session")
def structured_image_dir(tmp_path_factory):
    """STRUCTURED synthetic images (smooth gradients + solid discs):
    learnable low-frequency content, so a few pretrain epochs measurably
    raise eval PSNR (pure-noise images are nearly unlearnable and would
    mask an optimization bug).  Mirrors the content of the round-2
    manual real-TPU learning run (docs/benchmarks.md)."""
    root = tmp_path_factory.mktemp("structured")
    rng = np.random.default_rng(7)
    for i in range(20):
        h, w = 80, 96
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        gx, gy = rng.normal(size=2)
        base = (gx * xx / w + gy * yy / h)
        base = (base - base.min()) / (np.ptp(base) + 1e-9)
        img = np.stack([base * c for c in rng.random(3)], axis=-1)
        for _ in range(3):
            cy, cx = rng.random(2) * [h, w]
            r = 6 + rng.random() * 14
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[mask] = rng.random(3)
        arr = (img * 255).clip(0, 255).astype(np.uint8)
        Image.fromarray(arr).save(root / f"st_{i:02d}.png")
    return str(root)
