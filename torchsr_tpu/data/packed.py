"""Packed dataset format: decode once, train from mmap forever.

The TPU's classic input bottleneck is the HOST: PIL decode of a
DIV2K-class JPEG/PNG costs tens of ms of CPU per image, and a serving-
class TPU host has few cores.  The loaders already cache decoded images
in RAM (data/loader.py), but every process still pays a full-dataset
decode on its first epoch — the round-3 soak measured first-GAN-epoch
throughput at ~1/6 of the warm rate on a 1-vCPU host, pure decode.

``torchsr pack dataset/ dataset.tsrpack`` moves that cost offline: each
image is decoded ONCE (to exactly the ``_decode_rgb`` RGB layout the
live path uses) and stored as raw uint8 HWC bytes.  Training then mmaps
the archive and a "decode" is a zero-copy ``np.frombuffer`` view — the
OS page cache replaces the RAM decode cache, cold epochs run at warm
speed, and memory pressure is file-backed (evictable) instead of
anonymous.  Anywhere a dataset directory is accepted
(``--train-dir``/``--eval-dir``), a ``.tsrpack`` file works too, with
byte-identical batches for the same seed (tests/test_packed.py pins
this).

Layout (single file, streaming-writable, offsets 64-byte aligned):

    [8B magic "TSRPACK1"]
    [image payloads: raw uint8 HWC bytes, 64-byte aligned]
    [footer JSON: {"version": 1, "entries": [{name, h, w, offset}]}]
    [8B little-endian footer length][8B magic "TSRPACK1"]

The index rides at the END so the writer streams payloads without
knowing their count or sizes up front (the two trailing fields make the
footer locatable from the file tail).

The reference has no counterpart (its 16-worker DataLoader re-decodes
every sample, reference dataset.py:101-125, :278-294); this is the
FFCV/Grain-style answer sized to this framework.
"""

from __future__ import annotations

import json
import mmap
import os
import struct

import numpy as np

MAGIC = b"TSRPACK1"
_ALIGN = 64


def is_pack(path: str) -> bool:
    """True when ``path`` is a packed-dataset file (sniffed by magic,
    not extension, so renamed archives keep working)."""
    if not os.path.isfile(path):
        return False
    try:
        with open(path, "rb") as fh:
            return fh.read(len(MAGIC)) == MAGIC
    except OSError:
        return False


def pack_dataset(src_dir: str, out_path: str, log=None) -> int:
    """Decode every supported image under ``src_dir`` into ``out_path``.

    Entries are written in ``discover_images`` order (sorted), so a
    pack of a directory and the directory itself produce identical
    splits/batches for the same seed.  Returns the image count.
    """
    from torchsr_tpu.data.discovery import discover_images
    from torchsr_tpu.data.loader import _decode_rgb

    paths = discover_images(src_dir)
    if not paths:
        raise ValueError(
            f"no supported images found in {src_dir!r} to pack"
        )
    entries = []
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(MAGIC)
        for i, path in enumerate(paths):
            arr = np.ascontiguousarray(_decode_rgb(path))
            pad = (-fh.tell()) % _ALIGN
            fh.write(b"\0" * pad)
            offset = fh.tell()
            fh.write(arr.tobytes())
            entries.append({
                "name": os.path.basename(path),
                "h": int(arr.shape[0]),
                "w": int(arr.shape[1]),
                "offset": offset,
            })
            if log and (i + 1) % 100 == 0:
                log(f"packed {i + 1}/{len(paths)}")
        names = [e["name"] for e in entries]
        if len(set(names)) != len(names):
            raise ValueError(
                "duplicate basenames across the source directory; a "
                "pack addresses images by basename"
            )
        footer = json.dumps({"version": 1, "entries": entries}).encode()
        fh.write(footer)
        fh.write(struct.pack("<Q", len(footer)))
        fh.write(MAGIC)
    os.replace(tmp, out_path)
    if log:
        size = os.path.getsize(out_path)
        log(
            f"packed {len(paths)} images ({size / 1e9:.2f} GB raw "
            f"uint8) into {out_path}"
        )
    return len(paths)


class PackedDataset:
    """mmap-backed reader: ``get(name)`` is a zero-copy uint8 view."""

    def __init__(self, path: str) -> None:
        self.path = path
        with open(path, "rb") as fh:
            head = fh.read(len(MAGIC))
            if head != MAGIC:
                raise ValueError(f"{path!r} is not a TSRPACK file")
            fh.seek(-(len(MAGIC) + 8), os.SEEK_END)
            footer_len, = struct.unpack("<Q", fh.read(8))
            if fh.read(len(MAGIC)) != MAGIC:
                raise ValueError(
                    f"{path!r} is truncated (missing trailing magic) — "
                    "re-run torchsr pack"
                )
            fh.seek(-(len(MAGIC) + 8 + footer_len), os.SEEK_END)
            footer = json.loads(fh.read(footer_len))
        if footer.get("version") != 1:
            raise ValueError(
                f"unsupported pack version {footer.get('version')!r}"
            )
        self._entries = {e["name"]: e for e in footer["entries"]}
        self.names = [e["name"] for e in footer["entries"]]
        self._file = open(path, "rb")
        self._mm = mmap.mmap(
            self._file.fileno(), 0, access=mmap.ACCESS_READ
        )

    def __len__(self) -> int:
        return len(self.names)

    def get(self, name: str) -> np.ndarray:
        """(H, W, 3) uint8 view into the mapping (no copy; crops slice
        only the bytes they touch)."""
        e = self._entries[name]
        arr = np.frombuffer(
            self._mm, np.uint8, count=e["h"] * e["w"] * 3,
            offset=e["offset"],
        )
        return arr.reshape(e["h"], e["w"], 3)

    def close(self) -> None:
        self._mm.close()
        self._file.close()
