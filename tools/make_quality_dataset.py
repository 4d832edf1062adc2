#!/usr/bin/env python
"""Build the committed quality-evidence dataset (deterministic).

The environment ships exactly one real photograph
(``media/waterfalls-low-res.png``, the reference's bundled progress
sample). This tool turns it into a reproducible train/eval corpus:

* **photo images** — random square crops of the waterfall with the
  dihedral-group transforms (flips/rotations), channel permutations,
  and gamma/brightness jitter. Real photographic statistics (water
  texture, foliage, rock edges).
* **procedural images** — multi-octave value noise, oriented
  sinusoidal textures, gradient fields with discs and bars: learnable
  structure spanning frequencies the small photo underrepresents.

Train and eval sets use disjoint seeds AND disjoint photo crop regions
(eval crops come from the right third of the photo, train from the
left two thirds), so eval measures generalization, not crop identity.

Usage:
    python tools/make_quality_dataset.py --out /tmp/qds
    # -> /tmp/qds/train/*.png (200), /tmp/qds/eval/*.png (24)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PHOTO = os.path.join(REPO, "media", "waterfalls-low-res.png")
SIZE = 176  # fits ESRGAN's 128 crop and SRGAN's 96 with margin


def _jitter(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Photometric jitter in float [0,1]."""
    img = img.astype(np.float32) / 255.0
    gamma = 0.7 + 0.6 * rng.random()
    gain = 0.8 + 0.4 * rng.random()
    img = np.clip(img**gamma * gain, 0.0, 1.0)
    if rng.random() < 0.5:
        img = img[..., rng.permutation(3)]
    return (img * 255.0 + 0.5).astype(np.uint8)


def _photo_crop(
    rng: np.random.Generator, photo: np.ndarray, x_range: tuple[int, int]
) -> np.ndarray:
    h, w = photo.shape[:2]
    side = int(rng.integers(120, min(h, SIZE) + 1))
    y = int(rng.integers(0, h - side + 1))
    x0, x1 = x_range
    x = int(rng.integers(x0, max(x0 + 1, min(x1, w) - side + 1)))
    crop = photo[y : y + side, x : x + side]
    img = np.asarray(
        Image.fromarray(crop).resize((SIZE, SIZE), Image.BICUBIC)
    )
    k = int(rng.integers(4))
    img = np.rot90(img, k)
    if rng.random() < 0.5:
        img = img[:, ::-1]
    if rng.random() < 0.5:
        img = img[::-1]
    return _jitter(rng, np.ascontiguousarray(img))


def _value_noise(rng: np.random.Generator) -> np.ndarray:
    """Multi-octave smooth noise -> photographic-ish texture."""
    acc = np.zeros((SIZE, SIZE, 3), np.float32)
    amp, total = 1.0, 0.0
    for cells in (4, 8, 16, 32):
        grid = rng.random((cells + 1, cells + 1, 3)).astype(np.float32)
        img = np.asarray(
            Image.fromarray(
                (grid * 255).astype(np.uint8)
            ).resize((SIZE, SIZE), Image.BICUBIC),
            np.float32,
        ) / 255.0
        acc += amp * img
        total += amp
        amp *= 0.55
    return acc / total


def _procedural(rng: np.random.Generator) -> np.ndarray:
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / SIZE
    kind = rng.integers(3)
    if kind == 0:
        img = _value_noise(rng)
    elif kind == 1:
        # oriented sinusoid texture over a gradient
        fx, fy = rng.integers(2, 14, size=2)
        phase = rng.random() * 6.283
        wave = 0.5 + 0.5 * np.sin(
            6.283 * (fx * xx + fy * yy) + phase
        )
        base = np.stack(
            [wave * c for c in 0.3 + 0.7 * rng.random(3)], -1
        )
        img = 0.6 * base + 0.4 * _value_noise(rng)
    else:
        gx, gy = rng.normal(size=2)
        base = gx * xx + gy * yy
        base = (base - base.min()) / (np.ptp(base) + 1e-9)
        img = np.stack([base * c for c in rng.random(3)], -1)
        for _ in range(int(rng.integers(3, 7))):
            cy, cx = rng.random(2)
            r = 0.04 + 0.12 * rng.random()
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[mask] = rng.random(3)
        img = 0.8 * img + 0.2 * _value_noise(rng)
    return (np.clip(img, 0, 1) * 255.0 + 0.5).astype(np.uint8)


def build(out: str, n_train: int, n_eval: int, seed: int) -> None:
    photo = np.asarray(Image.open(PHOTO).convert("RGB"))
    w = photo.shape[1]
    for split, n, sd, x_range in (
        ("train", n_train, seed, (0, (2 * w) // 3)),
        ("eval", n_eval, seed + 1000, ((2 * w) // 3 - SIZE, w)),
    ):
        rng = np.random.default_rng(sd)
        d = os.path.join(out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            if i % 2 == 0:
                img = _photo_crop(rng, photo, x_range)
            else:
                img = _procedural(rng)
            Image.fromarray(img).save(
                os.path.join(d, f"{split}_{i:03d}.png")
            )
        print(f"{split}: {n} images -> {d}")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-train", type=int, default=200)
    parser.add_argument("--n-eval", type=int, default=24)
    parser.add_argument("--seed", type=int, default=4)
    args = parser.parse_args()
    if not os.path.exists(PHOTO):
        print(f"error: {PHOTO} missing", file=sys.stderr)
        return 1
    build(args.out, args.n_train, args.n_eval, args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
