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
    parser.add_argument(
        "--scheme", default="reference",
        choices=["reference", "rrdbnet", "basicsr"],
        help="Module-naming scheme (ESRGAN only): 'reference' (the "
             "TorchSR layout, wrapped {'epoch','phase','state'}), "
             "'rrdbnet' (xinntao new-arch, plain state_dict), "
             "'basicsr' (Real-ESRGAN toolchains, wrapped {'params'}).",
    )
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
        if args.scheme != "reference":
            parser.error(
                "--scheme applies to ESRGAN only (SRGAN has no public "
                "RRDBNet counterpart)"
            )
        sd = torch_compat.export_srgan_generator(state)

    out = args.out or os.path.splitext(args.checkpoint)[0] + ".pth"
    if args.scheme == "reference":
        payload = {
            "epoch": ckpt["epoch"], "phase": ckpt["phase"], "state": sd,
        }
    elif args.scheme == "rrdbnet":
        # xinntao new-arch loaders expect a bare state_dict
        payload = torch_compat.externalize_esrgan_sd(sd, "rrdbnet")
        sd = payload
    else:
        # BasicSR/Real-ESRGAN loaders expect {"params": state_dict}
        sd = torch_compat.externalize_esrgan_sd(sd, "basicsr")
        payload = {"params": sd}
    torch.save(payload, out)
    print(
        f"Wrote {out} ({len(sd)} tensors, model={model}, "
        f"scheme={args.scheme})"
    )


if __name__ == "__main__":
    main()
