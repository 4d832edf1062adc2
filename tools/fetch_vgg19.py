#!/usr/bin/env python
"""Fetch, verify, and convert the pretrained VGG19 perceptual-loss weights.

One-step equivalent of the reference's baked-in torch hub download
(reference Dockerfile:11 pre-fetches ``vgg19-dcbb9e9d.pth``; loss.py:28-34
always builds the loss from it).  This downloads the same torchvision
weight file, verifies its sha256 against the hash embedded in the
filename (torchvision's convention: the first 8 hex chars), converts it
to the native msgpack ``.ckpt`` form, and drops it where the trainer
auto-discovers it (``~/.cache/torchsr_tpu/vgg19.ckpt``).

Usage:
    python tools/fetch_vgg19.py                  # fetch + convert + cache
    python tools/fetch_vgg19.py --pth-only       # keep only the .pth
    python tools/fetch_vgg19.py --from-file x.pth  # skip download (airgapped)

After this, ``torchsr train`` needs no ``--vgg-weights`` flag.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys
import tempfile
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

VGG19_URL = "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth"
SHA256_PREFIX = "dcbb9e9d"  # torchvision hash-in-filename convention
CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "torchsr_tpu"
)


def sha256_of(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def download(url: str, dest: str) -> None:
    print(f"Downloading {url} ...")
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dest))
    os.close(fd)
    try:
        with urllib.request.urlopen(url, timeout=120) as resp, open(
            tmp, "wb"
        ) as out:
            shutil.copyfileobj(resp, out)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def convert(pth: str, out: str) -> None:
    from flax import serialization

    from torchsr_tpu.models import torch_compat

    raw = torch_compat.load_torch_checkpoint(pth)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    if not any(str(k).startswith("features.") for k in sd):
        sd = {f"features.{k}": v for k, v in sd.items()}
    variables = torch_compat.convert_vgg19(sd)
    with open(out, "wb") as fh:
        fh.write(
            serialization.msgpack_serialize(
                serialization.to_state_dict(variables)
            )
        )


def main() -> int:
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument(
        "--from-file",
        help="existing vgg19-dcbb9e9d.pth (skip the download)",
    )
    parser.add_argument(
        "--cache-dir", default=CACHE_DIR,
        help=f"destination directory (default: {CACHE_DIR})",
    )
    parser.add_argument(
        "--pth-only", action="store_true",
        help="skip the msgpack conversion (trainer converts .pth "
             "on the fly, but then needs torch-format parsing at "
             "every startup)",
    )
    args = parser.parse_args()

    os.makedirs(args.cache_dir, exist_ok=True)
    pth = os.path.join(args.cache_dir, "vgg19-dcbb9e9d.pth")

    if args.from_file:
        src = args.from_file
        if not os.path.exists(src):
            print(f"error: {src} not found", file=sys.stderr)
            return 1
    elif os.path.exists(pth):
        print(f"Using cached {pth}")
        src = pth
    else:
        try:
            download(VGG19_URL, pth)
        except OSError as exc:
            print(
                f"error: download failed ({exc}).\n"
                "On an airgapped host, copy vgg19-dcbb9e9d.pth over "
                "and rerun with --from-file.",
                file=sys.stderr,
            )
            return 1
        src = pth

    digest = sha256_of(src)
    if not digest.startswith(SHA256_PREFIX):
        print(
            f"error: sha256 mismatch: {digest[:16]}... does not start "
            f"with {SHA256_PREFIX} — corrupt or wrong file",
            file=sys.stderr,
        )
        return 1
    print(f"sha256 OK ({digest[:16]}...)")

    if src != pth:
        shutil.copyfile(src, pth)
        print(f"Cached {pth}")

    if not args.pth_only:
        out = os.path.join(args.cache_dir, "vgg19.ckpt")
        convert(pth, out)
        print(f"Converted -> {out}")
        print("Training will auto-discover it; no --vgg-weights needed.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
