"""Packed dataset archives (data/packed.py, `torchsr pack`)."""

import numpy as np
import pytest
from PIL import Image

from torchsr_tpu.data.loader import initialize_datasets
from torchsr_tpu.data.packed import (
    MAGIC,
    PackedDataset,
    is_pack,
    pack_dataset,
)


@pytest.fixture(scope="module")
def pack_pair(tmp_path_factory):
    """(image dir, packed archive of it) with mixed sizes/modes."""
    root = tmp_path_factory.mktemp("packsrc")
    rng = np.random.default_rng(11)
    for i in range(9):
        h = int(rng.integers(48, 80))
        w = int(rng.integers(48, 80))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.png")
    # grayscale + RGBA exercise the RGB normalization parity
    Image.fromarray(
        rng.integers(0, 256, (50, 50), dtype=np.uint8), "L"
    ).save(root / "gray.png")
    Image.fromarray(
        rng.integers(0, 256, (50, 50, 4), dtype=np.uint8), "RGBA"
    ).save(root / "rgba.png")
    out = str(tmp_path_factory.mktemp("packout") / "ds.tsrpack")
    n = pack_dataset(str(root), out)
    assert n == 11
    return str(root), out


def test_sniff_and_roundtrip(pack_pair):
    src, out = pack_pair
    assert is_pack(out)
    assert not is_pack(src)  # a directory
    pack = PackedDataset(out)
    assert len(pack) == 11
    # every entry decodes byte-identically to the live decode path
    from torchsr_tpu.data.discovery import discover_images
    from torchsr_tpu.data.loader import _decode_rgb

    import os

    for path in discover_images(src):
        name = os.path.basename(path)
        np.testing.assert_array_equal(pack.get(name), _decode_rgb(path))
    pack.close()


def test_truncated_pack_rejected(pack_pair, tmp_path):
    _, out = pack_pair
    blob = open(out, "rb").read()
    bad = tmp_path / "trunc.tsrpack"
    bad.write_bytes(blob[:-5])
    with pytest.raises(ValueError, match="truncated"):
        PackedDataset(str(bad))
    notpack = tmp_path / "x.tsrpack"
    notpack.write_bytes(b"hello world, definitely not a pack")
    assert not is_pack(str(notpack))
    with pytest.raises(ValueError, match="not a TSRPACK"):
        PackedDataset(str(notpack))


def test_pack_batches_identical_to_directory(pack_pair):
    """Same seed -> byte-identical train/eval batches either way (the
    pack stores entries in discover_images order, so the seeded split
    selects the same images at the same positions)."""
    src, out = pack_pair
    kwargs = dict(batch_size=4, crop_size=32, workers=2, seed=7)
    tl_dir, ev_dir, n1, m1 = initialize_datasets(src, **kwargs)
    tl_pk, ev_pk, n2, m2 = initialize_datasets(out, **kwargs)
    assert (n1, m1) == (n2, m2)
    for (c1, f1), (c2, f2) in zip(tl_dir.epoch(3), tl_pk.epoch(3)):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(f1, f2)
    for (c1, v1), (c2, v2) in zip(ev_dir, ev_pk):
        assert v1 == v2
        np.testing.assert_array_equal(c1, c2)


def test_pack_as_eval_dir(pack_pair):
    src, out = pack_pair
    tl, ev, n, m = initialize_datasets(
        src, batch_size=2, crop_size=32, workers=1, seed=0,
        eval_directory=out,
    )
    assert m == 11  # eval uses ALL of the pack
    crops, valid = next(iter(ev))
    assert crops.shape == (2, 32, 32, 3)
    assert valid == 2


def test_cli_pack_and_train(pack_pair, tmp_path, monkeypatch):
    """`torchsr pack` + `train --train-dir ds.tsrpack` end to end."""
    import os

    from torchsr_tpu.cli import main

    src, _ = pack_pair
    monkeypatch.chdir(tmp_path)
    main(["pack", src, "ds.tsrpack"])
    assert is_pack("ds.tsrpack")
    main([
        "train",
        "--train-dir", "ds.tsrpack",
        "--model", "srgan",
        "--batch-size", "8",
        "--epochs", "0",
        "--pretrain-epochs", "1",
        "--data-workers", "2",
        "--seed", "5",
        "--disable-amp",
        "--skip-image-save",
        "--crop-size", "32",
        "--gen-blocks", "1",
        "--vgg-convs", "2",
        "--sync-saves",
    ])
    assert os.path.exists("srgan-psnr-latest.ckpt")


@pytest.mark.slow
def test_eval_accepts_pack(pack_pair, tmp_path, monkeypatch):
    """`torchsr eval ds.tsrpack` scores identically to the directory."""
    import json

    import jax
    import jax.numpy as jnp

    from torchsr_tpu.cli import main
    from torchsr_tpu.models import SRGANGenerator
    from torchsr_tpu.utils.checkpoint import save_checkpoint

    src, out = pack_pair
    monkeypatch.chdir(tmp_path)
    gen = SRGANGenerator(num_residual=1)
    variables = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), train=False
    )
    save_checkpoint(
        "srgan-gan-best.ckpt", 1, "gan",
        jax.tree.map(np.asarray, dict(variables)),
    )
    main(["eval", src, "--model", "srgan", "--report", "dir.json"])
    main(["eval", out, "--model", "srgan", "--report", "pack.json"])
    a = json.load(open("dir.json"))
    b = json.load(open("pack.json"))
    assert a["mean_psnr"] == b["mean_psnr"]
    assert a["mean_ssim"] == b["mean_ssim"]
    assert a["images"] == b["images"]


def test_pack_empty_dir_errors(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no supported images"):
        pack_dataset(str(tmp_path / "empty"), str(tmp_path / "o.tsrpack"))


def test_pack_magic_stable():
    # the on-disk contract: readers of older archives must keep working
    assert MAGIC == b"TSRPACK1"
