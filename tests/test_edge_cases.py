"""Edge cases: tiny datasets fill full batches; checkpoint precedence."""

import numpy as np
from PIL import Image

from torchsr_tpu.data.loader import TrainLoader
from torchsr_tpu.utils.checkpoint import find_checkpoint, save_checkpoint


def test_tiny_dataset_fills_batch(tmp_path):
    # 3 images, batch 8: batches must still be full (static XLA shapes)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    loader = TrainLoader(paths, batch_size=8, crop_size=32, workers=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    crops, flips = batches[0]
    assert crops.shape == (8, 32, 32, 3)
    assert flips.shape == (8, 2)


def test_explicit_checkpoint_not_a_fallback(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    save_checkpoint(
        "srgan-psnr-latest.ckpt", 3, "srgan-psnr",
        {"params": {"w": np.zeros(2, np.float32)}},
    )
    # explicit missing path -> no silent fallback to latest
    assert find_checkpoint("does-not-exist.ckpt") is None
    # default path resolves
    assert find_checkpoint("srgan-psnr-latest.ckpt") == \
        "srgan-psnr-latest.ckpt"
