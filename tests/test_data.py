"""Data pipeline tests: discovery, split, loaders, on-device synthesis."""

import numpy as np
import pytest

from torchsr_tpu.data.discovery import discover_images, split_dataset
from torchsr_tpu.data.loader import EvalLoader, TrainLoader, initialize_datasets
from torchsr_tpu.data.preprocess import synthesize_eval_triple, synthesize_pair


def test_discovery_and_split(image_dir):
    images = discover_images(image_dir)
    assert len(images) == 12
    train, test = split_dataset(images, 0.1, seed=0)
    assert len(train) + len(test) == 12
    assert len(test) == 2  # ceil(12 * 0.1)
    # deterministic in seed
    train2, test2 = split_dataset(images, 0.1, seed=0)
    assert train == train2 and test == test2
    train3, _ = split_dataset(images, 0.1, seed=1)
    assert train != train3


def test_train_loader_batches(image_dir):
    images = discover_images(image_dir)
    loader = TrainLoader(images, batch_size=4, crop_size=32, workers=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader) == 3
    crops, flips = batches[0]
    assert crops.shape == (4, 32, 32, 3) and crops.dtype == np.uint8
    assert flips.shape == (4, 2) and flips.dtype == np.bool_

    # reproducible epoch
    crops2, flips2 = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(crops, crops2)
    np.testing.assert_array_equal(flips, flips2)

    # shuffle differs across epochs (reference bug fixed: sampler epoch
    # is threaded through, SURVEY.md section 2 #8)
    crops3, _ = next(iter(loader.epoch(1)))
    assert not np.array_equal(crops, crops3)


def test_train_loader_sharding(image_dir):
    images = discover_images(image_dir)
    shards = [
        TrainLoader(images, batch_size=2, crop_size=32, workers=1,
                    seed=0, num_shards=2, shard_index=i)
        for i in range(2)
    ]
    seen = [
        {tuple(c[0, 0, :2, 0]) for c, _ in shard.epoch(0)}
        for shard in shards
    ]
    # both shards produce full batches and are not identical
    assert len(shards[0]) == len(shards[1]) == 3
    assert seen[0] != seen[1]


def test_eval_loader_padding_and_determinism(image_dir):
    images = discover_images(image_dir)[:5]
    loader = EvalLoader(images, batch_size=2, crop_size=32, workers=1, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    crops, valid = batches[-1]
    assert crops.shape == (2, 32, 32, 3)
    assert valid == 1  # 5 images in batches of 2 -> last batch padded
    # crops fixed across iterations (deterministic eval)
    again = list(loader)
    np.testing.assert_array_equal(batches[0][0], again[0][0])


def test_synthesize_pair_matches_pil_path(image_dir):
    from PIL import Image

    rng = np.random.default_rng(0)
    crops = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    flips = np.array([[True, False], [False, True]])
    lr, hr = synthesize_pair(crops, flips)
    assert lr.shape == (2, 8, 8, 3) and hr.shape == (2, 32, 32, 3)

    # reproduce sample 0 via the reference's host path: flip then PIL
    # bicubic downscale of the uint8 crop
    ref_hr = crops[0][:, ::-1, :]  # horizontal flip
    ref_lr = np.asarray(
        Image.fromarray(ref_hr).resize((8, 8), Image.BICUBIC),
        dtype=np.float32,
    ) / 255.0
    np.testing.assert_allclose(np.asarray(hr)[0], ref_hr / 255.0, atol=1e-6)
    assert np.abs(np.asarray(lr)[0] - ref_lr).max() < 3.0 / 255.0


def test_synthesize_eval_triple():
    rng = np.random.default_rng(1)
    crops = rng.integers(0, 256, size=(1, 32, 32, 3), dtype=np.uint8)
    lr, bic, hr = synthesize_eval_triple(crops)
    assert lr.shape == (1, 8, 8, 3)
    assert bic.shape == (1, 32, 32, 3)
    assert hr.shape == (1, 32, 32, 3)


def test_initialize_datasets_api(image_dir):
    train_loader, eval_loader, train_len, test_len = initialize_datasets(
        image_dir, batch_size=2, crop_size=32, workers=1,
        dataset_multiplier=2,
    )
    assert train_len == 20  # 10 train images x multiplier 2
    assert test_len == 4
    assert isinstance(train_loader, TrainLoader)
    assert isinstance(eval_loader, EvalLoader)


def test_initialize_datasets_separate_eval_dir(image_dir, tmp_path):
    """--eval-dir layout (DIV2K_train + DIV2K_valid): training uses ALL
    of the train directory (no 10% holdout) and eval uses ALL of the
    eval directory."""
    from PIL import Image

    eval_dir = tmp_path / "valid"
    eval_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)
        ).save(eval_dir / f"v{i}.png")

    train_loader, eval_loader, train_len, test_len = initialize_datasets(
        image_dir, batch_size=2, crop_size=32, workers=1,
        eval_directory=str(eval_dir),
    )
    assert train_len == 12  # all 12 train images, no holdout
    assert test_len == 3

    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no supported images"):
        initialize_datasets(
            image_dir, batch_size=2, crop_size=32, workers=1,
            eval_directory=str(tmp_path / "empty"),
        )


def test_lru_cache_evicts_and_returns_correct_data(image_dir):
    """The decode cache is LRU-bounded: with a budget under the working
    set it evicts the least-recently-used image and keeps serving
    correct pixels."""
    from torchsr_tpu.data.loader import _ImageCache, _decode_rgb

    images = sorted(discover_images(image_dir))[:3]
    sizes = [_decode_rgb(p).nbytes for p in images]
    cache = _ImageCache(max_bytes=sizes[0] + sizes[1] + 1)
    for _ in range(2):  # two rounds through 3 images on a 2-image budget
        for p in images:
            np.testing.assert_array_equal(cache.get(p), _decode_rgb(p))
    assert cache._used <= sizes[0] + sizes[1] + 1
    assert len(cache._data) <= 2


def test_windowed_shuffle_covers_and_varies(image_dir):
    """The windowed shuffle is still a permutation (full coverage),
    deterministic per (seed, epoch), different across epochs."""
    images = discover_images(image_dir)
    loader = TrainLoader(
        images, batch_size=4, crop_size=32, workers=1, seed=0,
        shuffle_window=4,
    )
    rng = np.random.default_rng((0, 0))
    order = loader._window_reorder(rng.permutation(12), rng)
    assert sorted(order.tolist()) == list(range(12))

    a = [c for c, _ in loader.epoch(0)]
    b = [c for c, _ in loader.epoch(0)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = [cr for cr, _ in loader.epoch(1)]
    assert not all(np.array_equal(x, y) for x, y in zip(a, c))


def test_out_of_core_windowed_decodes_each_image_once(image_dir, monkeypatch):
    """With a cache budget SMALLER than the dataset, the windowed
    shuffle + LRU cache decode each image exactly once per epoch; the
    global shuffle over the same budget necessarily re-decodes
    (thrashes).  This is the out-of-core loader contract."""
    import torchsr_tpu.data.loader as loader_mod

    images = sorted(discover_images(image_dir))
    per_image = max(
        loader_mod._decode_rgb(p).nbytes for p in images
    )
    budget = 5 * per_image  # dataset is 12 images

    calls = {"n": 0}
    real = loader_mod._decode_rgb

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(loader_mod, "_decode_rgb", counting)

    windowed = TrainLoader(
        images, batch_size=4, crop_size=32, workers=1, seed=0,
        cache_bytes=budget, shuffle_window=4,
    )
    for epoch in range(3):
        calls["n"] = 0
        list(windowed.epoch(epoch))
        # at most one decode per image per epoch (cache carryover
        # across the epoch boundary can make it fewer)
        assert calls["n"] <= 12, (epoch, calls["n"])
    assert calls["n"] > 0  # the budget really is under the dataset

    global_shuffle = TrainLoader(
        images, batch_size=4, crop_size=32, workers=1, seed=0,
        cache_bytes=budget,
    )
    list(global_shuffle.epoch(0))  # fill the cache
    calls["n"] = 0
    list(global_shuffle.epoch(1))
    assert calls["n"] > 0  # the bounded cache cannot avoid re-decodes


def test_crop_too_small_raises(tmp_path):
    from PIL import Image

    arr = np.zeros((16, 16, 3), np.uint8)
    Image.fromarray(arr).save(tmp_path / "small.png")
    loader = TrainLoader(
        [str(tmp_path / "small.png")], batch_size=1, crop_size=96, workers=1
    )
    with pytest.raises(ValueError, match="smaller than crop size"):
        next(iter(loader.epoch(0)))
