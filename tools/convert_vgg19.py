#!/usr/bin/env python
"""Convert torchvision VGG19 weights to a native perceptual-loss file.

Usage:
    python tools/convert_vgg19.py vgg19-dcbb9e9d.pth --out vgg19.ckpt

Training can consume either form via ``--vgg-weights`` (the ``.pth`` is
converted on the fly); this tool removes the torch dependency from the
training host.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("weights", help="torchvision vgg19 .pth file")
    parser.add_argument("--out", default="vgg19.ckpt")
    args = parser.parse_args()

    from flax import serialization

    from torchsr_tpu.models import torch_compat

    raw = torch_compat.load_torch_checkpoint(args.weights)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    if not any(str(k).startswith("features.") for k in sd):
        sd = {f"features.{k}": v for k, v in sd.items()}
    variables = torch_compat.convert_vgg19(sd)
    with open(args.out, "wb") as fh:
        fh.write(
            serialization.msgpack_serialize(
                serialization.to_state_dict(variables)
            )
        )
    n = sum(v.size for v in _leaves(variables))
    print(f"Wrote {args.out} ({n:,} parameters, 16 convs through relu5_4)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
