"""Tiled overlap-blend inference == monolithic inference (within halo).

The reference does a single whole-image forward (test.py:62); tiling must
reproduce it up to boundary-halo effects (SURVEY.md section 4's
"tiled-inference == monolithic-inference equivalence test").
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchsr_tpu.infer.tiled import tiled_upscale, upscale_image
from torchsr_tpu.ops.resize import nearest_upsample


def _toy_sr(batch: jnp.ndarray) -> jnp.ndarray:
    """A local-receptive-field 4x 'generator': 3x3 blur + nearest x4."""
    kernel = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0
    c = batch.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(
        batch.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    blurred = jax.lax.conv_general_dilated(
        batch, kernel, (1, 1), "SAME", dimension_numbers=dn,
        feature_group_count=c,
    )
    return nearest_upsample(blurred, 4)


def test_tiled_matches_monolithic():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((80, 70, 3)), jnp.float32)

    mono = _toy_sr(img[None])[0]
    tiled = tiled_upscale(
        _toy_sr, img, scale=4, tile=32, overlap=8, tile_batch=4
    )
    assert tiled.shape == mono.shape == (320, 280, 3)
    diff = np.abs(np.asarray(tiled) - np.asarray(mono))
    # Interior pixels differ only by low-weight halo contributions.
    assert diff.max() < 0.05
    assert diff.mean() < 3e-3
    mse = float(np.mean(diff**2))
    assert 10 * np.log10(1 / max(mse, 1e-12)) > 45.0


def test_tiled_random_geometry_sweep():
    """Seeded sweep over awkward sizes / tile / overlap combinations:
    output geometry always exact; equivalence holds whenever the
    overlap covers the toy generator's receptive field."""
    rng = np.random.default_rng(42)
    import pytest

    for _ in range(8):
        h = int(rng.integers(9, 97))
        w = int(rng.integers(9, 97))
        tile = int(rng.choice([16, 24, 32]))
        overlap = int(rng.choice([0, 4, 8]))
        if overlap >= tile:
            overlap = tile // 2
        img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
        out = tiled_upscale(
            _toy_sr, img, scale=4, tile=tile, overlap=overlap,
            tile_batch=3,
        )
        assert out.shape == (4 * h, 4 * w, 3), (h, w, tile, overlap)
        if overlap >= 4:
            # seam error decays with overlap (the ramp down-weights the
            # neighbor tile's wrong border pixels): a 4px ramp leaves
            # ~6% weight on them, an 8px ramp ~1.5%
            floor = 40.0 if overlap >= 8 else 25.0
            mono = _toy_sr(img[None])[0]
            mse = float(np.mean((np.asarray(out) - np.asarray(mono)) ** 2))
            psnr = 10 * np.log10(1 / max(mse, 1e-12))
            assert psnr > floor, (h, w, tile, overlap, psnr)


def test_tiled_rejects_degenerate_overlap():
    """overlap >= tile would zero the stride (range step 0 /
    IndexError); the library boundary raises a clear ValueError."""
    import pytest

    img = jnp.zeros((80, 80, 3), jnp.float32)
    for bad in (32, 33):
        with pytest.raises(ValueError, match="overlap"):
            tiled_upscale(_toy_sr, img, scale=4, tile=32, overlap=bad)
    with pytest.raises(ValueError, match="overlap"):
        tiled_upscale(_toy_sr, img, scale=4, tile=32, overlap=-1)


def test_tiled_small_image_pads():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((20, 24, 3)), jnp.float32)
    out = tiled_upscale(_toy_sr, img, scale=4, tile=32, overlap=8)
    assert out.shape == (80, 96, 3)


def test_upscale_image_uint8_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = upscale_image(_toy_sr, img, scale=4, tile=32, overlap=8)
    assert out.shape == (160, 160, 3)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    # tile=0 -> monolithic path
    out2 = upscale_image(_toy_sr, img, scale=4, tile=0)
    assert out2.shape == (160, 160, 3)
