"""Golden tests: matmul bicubic resize vs PIL's resampler.

The LR synthesis must track PIL closely for PSNR parity with the
reference pipeline (SURVEY.md section 7 hard part (b)).  PIL computes in
8-bit fixed point, so we allow a small absolute tolerance.
"""

import numpy as np
import pytest
from PIL import Image

from torchsr_tpu.ops.resize import bicubic_resize, nearest_upsample, resample_matrix


def _pil_resize(arr: np.ndarray, out_hw) -> np.ndarray:
    img = Image.fromarray(arr)
    img = img.resize((out_hw[1], out_hw[0]), Image.BICUBIC)
    return np.asarray(img, dtype=np.float32) / 255.0


@pytest.mark.parametrize("in_hw,out_hw", [
    ((96, 96), (24, 24)),      # the SRGAN 4x training downscale
    ((128, 128), (32, 32)),    # the ESRGAN 4x training downscale
    ((64, 48), (16, 12)),      # non-square
    ((24, 24), (96, 96)),      # 4x upscale (the bicubic compare branch)
])
def test_matches_pil(in_hw, out_hw):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    # PIL clamps overshoot to the uint8 range; clip ours to compare.
    ours = np.clip(np.asarray(bicubic_resize(arr[None], out_hw))[0], 0, 1)
    ref = _pil_resize(arr, out_hw)
    # We emulate PIL's two-pass uint8 pipeline exactly; the residual
    # difference is PIL's fixed-point *coefficient* rounding (<= 2/255).
    assert np.abs(ours - ref).max() <= 2.5 / 255.0
    assert np.abs(ours - ref).mean() < 0.8 / 255.0


def test_rows_sum_to_one():
    m = resample_matrix(96, 24)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_identity_when_same_size():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(1, 16, 16, 3), dtype=np.uint8)
    out = np.asarray(bicubic_resize(arr, (16, 16)))
    np.testing.assert_allclose(out, arr / 255.0, atol=1e-6)


def test_nearest_upsample():
    x = np.arange(2 * 2 * 3, dtype=np.float32).reshape(1, 2, 2, 3)
    up = np.asarray(nearest_upsample(x, 2))
    assert up.shape == (1, 4, 4, 3)
    np.testing.assert_array_equal(up[0, :2, :2, 0], x[0, 0, 0, 0])
    np.testing.assert_array_equal(up[0, 2:, 2:, 1], x[0, 1, 1, 1])
