"""depth_to_space must match torch.nn.PixelShuffle channel ordering.

This guarantees torch-checkpoint weight compatibility for the SRGAN
subpixel stages (reference srgan/residual.py:16-48).
"""

import numpy as np
import torch

from torchsr_tpu.ops.pixel_shuffle import depth_to_space, space_to_depth


def test_matches_torch_pixel_shuffle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4, 8 * 4)).astype(np.float32)  # NHWC
    ours = np.asarray(depth_to_space(x, 2))
    # torch: NCHW in, NCHW out
    torch_in = torch.from_numpy(x.transpose(0, 3, 1, 2))
    torch_out = torch.pixel_shuffle(torch_in, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, torch_out, atol=0)


def test_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 8, 16)).astype(np.float32)
    y = space_to_depth(depth_to_space(x, 2), 2)
    np.testing.assert_allclose(np.asarray(y), x)
