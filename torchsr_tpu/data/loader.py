"""Host-side data loaders: threaded decode + uint8 crop, device prefetch.

TPU-first redesign of the reference's DataLoader assembly (reference
dataset.py:231-428).  Differences by design:

  * Worker *threads* instead of 16 worker processes — PIL decode releases
    the GIL, and the host does no arithmetic (the LR synthesis runs on
    device, see torchsr_tpu.data.preprocess), so threads suffice and skip
    the process-spawn/serialize overhead.
  * Decoded images are cached in host RAM (configurable budget), so after
    the first epoch the pipeline cost is pure uint8 slicing.
  * The per-epoch shuffle is deterministic in (seed, epoch) — fixing the
    reference bug where ``DistributedSampler.set_epoch`` is never called
    and the shuffle order repeats every epoch (see SURVEY.md section 2 #8).
  * Sharding across hosts replaces DistributedSampler: each process reads
    only its 1/num_shards of every epoch (interleaved, padded by
    wrap-around exactly like DistributedSampler).
  * Train batches drop the final partial batch (static shapes for XLA);
    eval batches are padded with a valid-sample count so metrics can mask.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np
from PIL import Image


def _decode_rgb(path: str) -> np.ndarray:
    """Decode an image file to an HxWx3 uint8 array.

    Always converts to RGB — unlike the reference, which feeds whatever
    mode PIL reports and crashes on grayscale/palette/RGBA inputs.
    """
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


class _ImageCache:
    """Bounded in-RAM LRU cache of decoded images (thread-safe).

    Least-recently-used eviction (rather than first-come-stays) makes
    the cache a sliding WINDOW over the access stream: combined with
    the loader's windowed shuffle (``shuffle_window``), datasets larger
    than the budget decode each image once per epoch instead of
    re-decoding every sample (the out-of-core path; a plain global
    shuffle over an over-budget dataset necessarily thrashes any
    bounded cache).  Decoding happens outside the lock; a concurrent
    duplicate decode of the same image is possible but harmless.
    """

    def __init__(self, max_bytes: int, reader=_decode_rgb) -> None:
        self._max_bytes = max_bytes
        self._reader = reader
        self._used = 0
        self._lock = threading.Lock()
        from collections import OrderedDict

        self._data: "OrderedDict[str, np.ndarray]" = OrderedDict()

    def get(self, path: str) -> np.ndarray:
        with self._lock:
            cached = self._data.get(path)
            if cached is not None:
                self._data.move_to_end(path)
                return cached
        arr = self._reader(path)
        with self._lock:
            if path not in self._data:
                while self._data and self._used + arr.nbytes > self._max_bytes:
                    _, old = self._data.popitem(last=False)
                    self._used -= old.nbytes
                if self._used + arr.nbytes <= self._max_bytes:
                    self._data[path] = arr
                    self._used += arr.nbytes
        return arr


_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """One splitmix64 mixing round — a fast, well-distributed 64-bit
    hash used to derive per-sample crop/flip randomness in O(1) (a
    ``np.random.default_rng`` construction costs ~66us per sample, which
    would dominate the warm-cache loader)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return (x ^ (x >> 31)) & _M64


def _sample_randoms(seed: int, epoch: int, idx: int) -> tuple[int, int, int]:
    """Three deterministic 64-bit values for (crop_y, crop_x, flips)."""
    r0 = _splitmix64(
        ((seed + 1) * 0x9E3779B97F4A7C15 + (epoch + 1)) & _M64
    )
    r0 = _splitmix64(r0 ^ idx)
    r1 = _splitmix64(r0)
    r2 = _splitmix64(r1)
    return r0, r1, r2


def _check_crop(shape: tuple[int, ...], size: int) -> None:
    h, w = shape[:2]
    if h < size or w < size:
        raise ValueError(
            f"image {(h, w)} smaller than crop size {size}; the "
            "dataset must contain images at least crop_size x crop_size"
        )


class TrainLoader:
    """Epoch-based loader yielding (uint8 HR crops, flip bits) batches.

    Each sample's randomness (crop position, flips) is a deterministic
    function of (seed, epoch, sample index), so runs are reproducible and
    every host draws consistent, non-overlapping work.
    """

    def __init__(
        self,
        paths: list[str],
        batch_size: int,
        crop_size: int,
        dataset_multiplier: int = 1,
        workers: int = 8,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        cache_bytes: int = 32 << 30,
        shuffle_window: int = 0,
        reader=None,
    ) -> None:
        if not paths:
            raise ValueError("TrainLoader needs at least one image")
        self.paths = list(paths) * dataset_multiplier
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.workers = max(1, workers)
        # Out-of-core option: instead of one global permutation, shuffle
        # WINDOWS of `shuffle_window` images (windows in random order,
        # samples shuffled within a window, different grouping every
        # epoch).  Access then has locality, so an LRU decode cache that
        # holds >= one window decodes each image ONCE per epoch no
        # matter how far the dataset exceeds the cache budget (Grain's
        # window-shuffle design; 0 = global shuffle).
        self.shuffle_window = int(shuffle_window)
        # A custom reader (e.g. a PackedDataset's mmap view getter) is
        # its own cache — the OS page cache — so the RAM LRU is skipped.
        self._cache = _ImageCache(
            0 if reader is not None else cache_bytes,
            reader or _decode_rgb,
        )
        self._pool = ThreadPoolExecutor(max_workers=self.workers)

        # Samples per shard, DistributedSampler-style wrap-around padding,
        # then truncated to full batches for static XLA shapes.
        per_shard = -(-len(self.paths) // num_shards)
        self.batches_per_epoch = max(1, per_shard // batch_size) \
            if per_shard >= batch_size else 1
        self.samples_per_epoch = self.batches_per_epoch * batch_size

    def __len__(self) -> int:
        return self.batches_per_epoch

    @property
    def dataset_len(self) -> int:
        """Total (unsharded) dataset size — the reference's train_len."""
        return len(self.paths)

    def _sample(self, path: str, epoch: int, idx: int):
        img = self._cache.get(path)
        size = self.crop_size
        _check_crop(img.shape, size)
        r0, r1, r2 = _sample_randoms(self.seed, epoch, idx)
        top = r0 % (img.shape[0] - size + 1)
        left = r1 % (img.shape[1] - size + 1)
        crop = img[top:top + size, left:left + size]
        flips = np.array([r2 & 1, (r2 >> 1) & 1], dtype=bool)
        return crop, flips

    def _window_reorder(self, shard: np.ndarray, rng) -> np.ndarray:
        """Regroup a shard's sample sequence into windows of
        ``shuffle_window`` images visited in random order (samples
        shuffled within each window) — same multiset of samples, but
        with access locality, so an LRU decode cache holding >= one
        window decodes each image once per epoch however far the
        dataset exceeds the cache budget (Grain's window-shuffle
        design)."""
        w = self.shuffle_window
        if w <= 0 or w >= len(shard):
            return shard
        windows = [shard[i:i + w] for i in range(0, len(shard), w)]
        order = []
        for wi in rng.permutation(len(windows)):
            win = windows[int(wi)]
            order.append(win[rng.permutation(len(win))])
        return np.concatenate(order)

    def epoch(self, epoch_idx: int) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Iterate one epoch's batches for this shard."""
        n = len(self.paths)
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = rng.permutation(n)
        # Pad to a multiple of num_shards by wrapping, then interleave.
        total = -(-n // self.num_shards) * self.num_shards
        if total > n:
            order = np.concatenate([order, order[: total - n]])
        shard = order[self.shard_index::self.num_shards]
        if len(shard) < self.samples_per_epoch:
            # tiny datasets: wrap so every batch is full (static shapes)
            reps = -(-self.samples_per_epoch // len(shard))
            shard = np.tile(shard, reps)
        shard = shard[: self.samples_per_epoch]
        # Windowing applies AFTER host sharding so each host's access
        # stream keeps its own locality.
        shard = self._window_reorder(shard, rng)

        bs = self.batch_size
        for b in range(self.batches_per_epoch):
            idx = shard[b * bs:(b + 1) * bs]
            results = list(
                self._pool.map(
                    lambda i: self._sample(
                        self.paths[int(i)], epoch_idx, int(i)
                    ),
                    idx,
                )
            )
            crops = np.stack([r[0] for r in results])
            flips = np.stack([r[1] for r in results])
            yield crops, flips


class EvalLoader:
    """Deterministic eval loader yielding padded uint8 crop batches.

    Crops are a fixed function of (seed, image index) so validation is
    stable across epochs — the reference re-crops randomly every eval
    pass (dataset.py:193-196), which adds noise to its PSNR curve.
    Yields ``(crops_u8, valid)`` where the last batch may be padded and
    ``valid`` counts real samples.
    """

    def __init__(
        self,
        paths: list[str],
        batch_size: int,
        crop_size: int,
        dataset_multiplier: int = 1,
        workers: int = 8,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        cache_bytes: int = 8 << 30,
        reader=None,
    ) -> None:
        if not paths:
            raise ValueError("EvalLoader needs at least one image")
        self.paths = list(paths) * dataset_multiplier
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.seed = seed
        self._cache = _ImageCache(
            0 if reader is not None else cache_bytes,
            reader or _decode_rgb,
        )
        self._pool = ThreadPoolExecutor(max_workers=max(1, workers))
        indices = np.arange(len(self.paths))
        self.indices = indices[shard_index::num_shards]
        self.batches_per_epoch = -(-len(self.indices) // batch_size)

    def __len__(self) -> int:
        return self.batches_per_epoch

    @property
    def dataset_len(self) -> int:
        return len(self.paths)

    def _sample(self, i: int) -> np.ndarray:
        img = self._cache.get(self.paths[int(i)])
        size = self.crop_size
        _check_crop(img.shape, size)
        # epoch fixed at -1: eval crops never change across epochs
        r0, r1, _ = _sample_randoms(self.seed, -1, int(i))
        top = r0 % (img.shape[0] - size + 1)
        left = r1 % (img.shape[1] - size + 1)
        return img[top:top + size, left:left + size]

    def __iter__(self) -> Iterator[tuple[np.ndarray, int]]:
        bs = self.batch_size
        for b in range(self.batches_per_epoch):
            idx = self.indices[b * bs:(b + 1) * bs]
            crops = list(self._pool.map(self._sample, idx))
            valid = len(crops)
            while len(crops) < bs:
                crops.append(np.zeros_like(crops[0]))
            yield np.stack(crops), valid


def initialize_datasets(
    train_directory: str,
    batch_size: int,
    crop_size: int = 96,
    upscale_factor: int = 4,
    dataset_multiplier: int = 1,
    workers: int = 16,
    num_shards: int = 1,
    shard_index: int = 0,
    seed: int = 0,
    shuffle_window: int = 0,
    cache_bytes: int | None = None,
    eval_directory: str | None = None,
) -> tuple[TrainLoader, EvalLoader, int, int]:
    """Discover, split 90/10, and build loaders.

    API parity with the reference's ``initialize_datasets``
    (dataset.py:364-428): returns
    (train_loader, test_loader, train_len, test_len).

    ``eval_directory``: when given (e.g. DIV2K_valid alongside
    DIV2K_train — the standard benchmark layout), validation uses ALL
    of it and training uses ALL of ``train_directory`` instead of the
    reference's 90/10 split of one directory.
    """
    from torchsr_tpu.data.discovery import discover_images, split_dataset
    from torchsr_tpu.data.packed import PackedDataset, is_pack

    del upscale_factor  # synthesis happens on device; scale passed there

    def _source(directory: str):
        """(name list, reader-or-None) for a directory OR a .tsrpack.

        A pack stores entries in discover_images order, so both forms
        of the same dataset produce identical splits and batches for
        the same seed (tests/test_packed.py pins byte-equality)."""
        if is_pack(directory):
            pack = PackedDataset(directory)
            return pack.names, pack.get
        return discover_images(directory), None

    images, train_reader = _source(train_directory)
    if eval_directory:
        train_paths = images
        test_paths, eval_reader = _source(eval_directory)
        if not test_paths:
            raise ValueError(
                f"no supported images found in eval dir {eval_directory}"
            )
    else:
        train_paths, test_paths = split_dataset(images, 0.1, seed)
        eval_reader = train_reader
    extra = {} if cache_bytes is None else {"cache_bytes": cache_bytes}
    train_loader = TrainLoader(
        train_paths, batch_size, crop_size,
        dataset_multiplier=dataset_multiplier, workers=workers,
        seed=seed, num_shards=num_shards, shard_index=shard_index,
        shuffle_window=shuffle_window, reader=train_reader, **extra,
    )
    eval_loader = EvalLoader(
        test_paths, batch_size, crop_size,
        dataset_multiplier=dataset_multiplier, workers=workers,
        seed=seed, num_shards=num_shards, shard_index=shard_index,
        reader=eval_reader,
    )
    return (
        train_loader,
        eval_loader,
        train_loader.dataset_len,
        eval_loader.dataset_len,
    )
