"""Checkpointing with the reference's best/latest semantics + torch interop.

Format: a single msgpack file (via flax.serialization) holding
``{"epoch", "phase", "state"}`` — the same metadata contract as the
reference (srgan/trainer.py:254-258) — plus, unlike the reference, the
full training state (discriminator, all three optimizer states, RNG
counter) under ``"extra"`` so resume is lossless.  The reference loses
discriminator/optimizer state on every resume (SURVEY.md section 5); we
restore it when present and degrade gracefully (generator-only) when
loading a converted torch checkpoint.

File naming parity: ``{model}-{phase}-{best,latest}.ckpt`` in the
working directory, mirroring the reference's ``.pth`` names.  Loading
accepts both our ``.ckpt`` and reference ``.pth`` files (the latter via
torchsr_tpu.models.torch_compat).
"""

from __future__ import annotations

import os


import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(
    path: str,
    epoch: int,
    phase: str,
    generator_state: dict,
    extra: dict | None = None,
) -> None:
    """Write an atomic checkpoint file.

    ``generator_state``: ``{"params": ..., "batch_stats": ...}`` of the
    generator — the part the reference persists.  ``extra``: optional
    full-train-state payload for lossless resume.
    """
    payload = {
        "epoch": int(epoch),
        "phase": str(phase),
        "state": _to_host(generator_state),
    }
    if extra is not None:
        payload["extra"] = _to_host(extra)
    # to_state_dict converts optax namedtuple states into plain dicts so
    # the whole payload is msgpack-serializable.
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(payload)
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, model: str | None = None) -> dict | None:
    """Load a checkpoint, returning None when the file doesn't exist.

    Accepts our msgpack ``.ckpt`` format or a reference torch ``.pth``
    (``{"epoch", "phase", "state": torch state_dict}``, converted on the
    fly — requires ``model`` in {srgan, esrgan} to pick the converter).
    """
    if not path or not os.path.exists(path):
        return None
    if path.endswith((".pth", ".pt")):
        return _load_torch_checkpoint(path, model)
    with open(path, "rb") as fh:
        blob = fh.read()
    try:
        return serialization.msgpack_restore(blob)
    except Exception:
        # Fall back to torch pickle with a mis-matched extension.
        return _load_torch_checkpoint(path, model)


def _load_torch_checkpoint(path: str, model: str | None) -> dict:
    from torchsr_tpu.models import torch_compat

    raw = torch_compat.load_torch_checkpoint(path)
    if isinstance(raw, dict) and "state" in raw:
        state_dict, epoch, phase = (
            raw["state"], raw.get("epoch", 1), raw.get("phase", "")
        )
    else:
        state_dict, epoch, phase = raw, 1, ""
    if model is None:
        # Infer from the keys: ESRGAN generators have RRDB blocks.
        is_esrgan = any("RDB" in k for k in state_dict)
        model = "esrgan" if is_esrgan else "srgan"
    if model.lower() == "esrgan":
        state = torch_compat.convert_esrgan_generator(state_dict)
    else:
        state = torch_compat.convert_srgan_generator(state_dict)
    return {"epoch": int(epoch), "phase": str(phase), "state": state}


def find_checkpoint(*candidates: str) -> str | None:
    """First existing path among candidates (also tries .pth fallbacks
    for .ckpt names, so reference-produced files are picked up)."""
    for cand in candidates:
        if not cand:
            continue
        if os.path.exists(cand):
            return cand
        if cand.endswith(".ckpt"):
            alt = cand[: -len(".ckpt")] + ".pth"
            if os.path.exists(alt):
                return alt
    return None
