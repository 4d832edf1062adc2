#!/usr/bin/env python
"""Convert a reference TorchSR ``.pth`` checkpoint to a native ``.ckpt``.

Usage:
    python tools/convert_torch_checkpoint.py srgan-gan-best.pth \
        [--model srgan|esrgan] [--out srgan-gan-best.ckpt]

The CLI and trainers also load ``.pth`` files directly; this tool just
materializes the converted form (faster subsequent loads, no torch
dependency at run time).
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
    parser.add_argument("checkpoint", help="Path to the torch .pth file")
    parser.add_argument(
        "--model", choices=["srgan", "esrgan"],
        help="Model family (default: inferred from the state dict keys)",
    )
    parser.add_argument(
        "--out", help="Output path (default: input with .ckpt extension)"
    )
    args = parser.parse_args()

    from torchsr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    converted = load_checkpoint(args.checkpoint, args.model)
    out = args.out or os.path.splitext(args.checkpoint)[0] + ".ckpt"
    save_checkpoint(
        out, converted["epoch"], converted["phase"], converted["state"]
    )
    print(f"Wrote {out} (epoch={converted['epoch']}, "
          f"phase={converted['phase'] or 'unknown'})")


if __name__ == "__main__":
    main()
