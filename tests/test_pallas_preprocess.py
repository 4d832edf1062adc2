"""Pallas fused pair-synthesis kernel == XLA reference path.

Runs in interpreter mode on CPU (the compiled path is exercised on real
TPU hardware by tools/bench_preprocess.py).
"""

import numpy as np

from torchsr_tpu.data.preprocess import synthesize_pair
from torchsr_tpu.ops.pallas.preprocess import synthesize_pair_pallas


def test_pallas_pair_matches_xla_path():
    rng = np.random.default_rng(0)
    crops = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    flips = rng.random((4, 2)) < 0.5
    lr_ref, hr_ref = synthesize_pair(crops, flips)
    lr, hr = synthesize_pair_pallas(crops, flips, interpret=True)
    np.testing.assert_array_equal(np.asarray(hr), np.asarray(hr_ref))
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(lr_ref))


def test_pallas_pair_no_flips():
    rng = np.random.default_rng(1)
    crops = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    flips = np.zeros((2, 2), dtype=bool)
    lr, hr = synthesize_pair_pallas(crops, flips, interpret=True)
    assert lr.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(
        np.asarray(hr), crops.astype(np.float32) / 255.0
    )
