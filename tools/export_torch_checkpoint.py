#!/usr/bin/env python
"""Export a native ``.ckpt`` back to a reference-compatible ``.pth``.

Usage:
    python tools/export_torch_checkpoint.py srgan-gan-best.ckpt \
        [--model srgan|esrgan] [--out srgan-gan-best.pth]

The result loads in the reference TorchSR (``torch.load``; the dict
carries the same ``{"epoch", "phase", "state"}`` contract with a plain
state_dict), closing the interop loop: reference -> torchsr-tpu ->
reference.
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
    parser.add_argument("checkpoint", help="native .ckpt path")
    parser.add_argument("--model", choices=["srgan", "esrgan"])
    parser.add_argument("--out")
    args = parser.parse_args()

    import torch

    from torchsr_tpu.models import torch_compat
    from torchsr_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(args.checkpoint)
    state = ckpt["state"]
    model = args.model
    if model is None:
        model = "esrgan" if any(
            str(k).startswith("block") and "rdb1" in state["params"][k]
            for k in state["params"] if str(k).startswith("block")
        ) else "srgan"
    if model == "esrgan":
        sd = torch_compat.export_esrgan_generator(state)
    else:
        sd = torch_compat.export_srgan_generator(state)

    out = args.out or os.path.splitext(args.checkpoint)[0] + ".pth"
    torch.save(
        {"epoch": ckpt["epoch"], "phase": ckpt["phase"], "state": sd},
        out,
    )
    print(f"Wrote {out} ({len(sd)} tensors, model={model})")


if __name__ == "__main__":
    main()
