"""Torch checkpoint interop: load reference ``.pth`` files into our models.

The reference saves generator-only checkpoints as
``{"epoch", "phase", "state": state_dict}`` (srgan/trainer.py:254-258) and
its inference path strips DDP's ``module.`` prefix (test.py:43-55).  These
converters map those torch ``state_dict`` layouts onto our flax NHWC param
trees so users can bring existing TorchSR checkpoints to the TPU stack.

ESRGAN additionally accepts the three public RRDBNet naming schemes —
the graph is identical to the reference's generator, so the widely
distributed pretrained weights load directly (``torchsr test
--checkpoint RRDB_ESRGAN_x4.pth``):

  * xinntao old-arch (``RRDB_ESRGAN_x4.pth``): ``model.0``,
    ``model.1.sub.{i}.RDB{j}.conv{c}.0``, ``model.1.sub.{N}`` trunk,
    ``model.{3,6,8,10}`` head.
  * xinntao new-arch (``RRDBNet``): ``conv_first``,
    ``RRDB_trunk.{i}.RDB{j}.conv{c}``, ``trunk_conv``, ``upconv1/2``,
    ``HRconv``, ``conv_last``.
  * BasicSR / Real-ESRGAN (``RealESRGAN_x4plus.pth``): ``conv_first``,
    ``body.{i}.rdb{j}.conv{c}``, ``conv_body``, ``conv_up1/2``,
    ``conv_hr``, ``conv_last`` (checkpoints wrapped in ``params`` /
    ``params_ema`` are unwrapped by ``load_torch_checkpoint``).

Layout conversions:
  * conv kernels: torch OIHW -> flax HWIO
  * linear kernels: torch (out, in) -> flax (in, out); when the linear
    consumes a flattened conv map, the input axis is additionally permuted
    from CHW-flattening order to our HWC-flattening order.
  * BatchNorm: weight/bias -> scale/bias params; running_mean/var ->
    batch_stats.
  * PReLU: weight -> alpha.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def strip_ddp_prefix(state_dict: Mapping[str, Any]) -> dict:
    """Remove DDP's ``module.`` prefix from every key (ref test.py:43-55).

    Unlike the reference (which crashes on non-DDP checkpoints due to an
    unbound variable), non-prefixed keys pass through unchanged.
    """
    out = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        out[key] = value
    return out


def _np(t) -> np.ndarray:
    """torch tensor (or array) -> float32 numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> dict:
    """One torch Conv2d -> our layers.Conv param dict (HWIO)."""
    params = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        params["bias"] = _np(sd[f"{prefix}.bias"])
    return {"conv": params}


def _bn(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """One torch BatchNorm2d -> (params, batch_stats) for layers.BatchNorm."""
    params = {
        "bn": {
            "scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    }
    stats = {
        "bn": {
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"]),
        }
    }
    return params, stats


def _prelu(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"alpha": _np(sd[f"{prefix}.weight"]).reshape(-1)}


def _linear(
    sd: Mapping[str, Any],
    prefix: str,
    chw: tuple[int, int, int] | None = None,
) -> dict:
    """torch Linear -> our layers.Dense params.

    ``chw``: if the linear consumes a flattened conv feature map, pass the
    torch-side (C, H, W) so the input axis can be permuted from the
    reference's CHW flattening (torch.flatten of NCHW,
    srgan/discriminator.py:84) to our HWC flattening.
    """
    weight = _np(sd[f"{prefix}.weight"])  # (out, in)
    if chw is not None:
        c, h, w = chw
        weight = (
            weight.reshape(-1, c, h, w)
            .transpose(0, 2, 3, 1)
            .reshape(weight.shape[0], -1)
        )
    return {
        "dense": {
            "kernel": weight.T,
            "bias": _np(sd[f"{prefix}.bias"]),
        }
    }


def convert_srgan_generator(state_dict: Mapping[str, Any]) -> dict:
    """Reference SRGAN generator state_dict -> flax variables dict.

    Torch module names per reference srgan/generator.py:37-58 and
    residual.py:16-92.
    """
    sd = strip_ddp_prefix(state_dict)
    params: dict = {}
    stats: dict = {}

    params["conv1"] = _conv(sd, "conv1.0")
    params["prelu1"] = _prelu(sd, "conv1.1")

    num_blocks = len(
        {k.split(".")[1] for k in sd if k.startswith("blocks.")}
    )
    for i in range(num_blocks):
        p = f"blocks.{i}"
        bp: dict = {}
        bs: dict = {}
        bp["conv1"] = _conv(sd, f"{p}.conv1", bias=False)
        bp["bn1"], bs["bn1"] = _bn(sd, f"{p}.bn1")
        bp["prelu"] = _prelu(sd, f"{p}.prelu")
        bp["conv2"] = _conv(sd, f"{p}.conv2", bias=False)
        bp["bn2"], bs["bn2"] = _bn(sd, f"{p}.bn2")
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs

    params["conv2"] = _conv(sd, "conv2.0", bias=False)
    params["bn2"], stats["bn2"] = _bn(sd, "conv2.1")

    num_up = len(
        {k.split(".")[1] for k in sd if k.startswith("conv_layers.")}
    )
    for i in range(num_up):
        p = f"conv_layers.{i}"
        params[f"upsample{i}"] = {
            "conv": _conv(sd, f"{p}.conv"),
            "prelu": _prelu(sd, f"{p}.prelu"),
        }

    params["conv3"] = _conv(sd, "conv3")
    return {"params": params, "batch_stats": stats}


def _canonical_esrgan_sd(sd: Mapping[str, Any]) -> Mapping[str, Any]:
    """Rewrite public RRDBNet naming schemes to the reference's names.

    The computation graph of xinntao's ESRGAN (old- and new-arch) and
    BasicSR's RRDBNet is identical to the reference generator
    (esrgan/generator.py:35-52) — conv, N RRDB (3 dense blocks of 5
    convs, 0.2 residual scaling), trunk conv + skip, two nearest+conv
    upsamples, HR conv, out conv — only the module names differ.  This
    maps each scheme onto the reference's keys so one converter serves
    all of them.  Reference-named (or unrecognized) dicts pass through
    unchanged; partially-mapped dicts raise rather than silently load.
    """
    import re

    keys = list(sd)
    rules = None
    if any(k.startswith("model.") for k in keys):
        # xinntao old-arch: only released at 4x; the fixed sequential
        # indices below ARE the 4x layout.
        if "model.10.weight" not in sd:
            raise ValueError(
                "old-arch ESRGAN checkpoint without model.10 — only the "
                "4x layout (model.0..model.10) is supported"
            )
        rules = [
            (re.compile(r"^model\.0\.(weight|bias)$"), r"conv1.\1"),
            (re.compile(r"^model\.1\.sub\.(\d+)\.(RDB\d)\.(conv[1-4])"
                        r"\.0\.(weight|bias)$"),
             r"blocks.\1.\2.\3.0.\4"),
            (re.compile(r"^model\.1\.sub\.(\d+)\.(RDB\d)\.conv5"
                        r"\.0\.(weight|bias)$"),
             r"blocks.\1.\2.conv5.\3"),
            (re.compile(r"^model\.1\.sub\.\d+\.(weight|bias)$"),
             r"conv2.\1"),
            (re.compile(r"^model\.3\.(weight|bias)$"), r"upsample1.\1"),
            (re.compile(r"^model\.6\.(weight|bias)$"), r"upsample2.\1"),
            (re.compile(r"^model\.8\.(weight|bias)$"), r"conv3.0.\1"),
            (re.compile(r"^model\.10\.(weight|bias)$"), r"conv4.\1"),
        ]
    elif any(k.startswith("RRDB_trunk.") for k in keys):
        rules = [
            (re.compile(r"^conv_first\.(weight|bias)$"), r"conv1.\1"),
            (re.compile(r"^RRDB_trunk\.(\d+)\.(RDB\d)\.(conv[1-4])"
                        r"\.(weight|bias)$"),
             r"blocks.\1.\2.\3.0.\4"),
            (re.compile(r"^RRDB_trunk\.(\d+)\.(RDB\d)\.conv5"
                        r"\.(weight|bias)$"),
             r"blocks.\1.\2.conv5.\3"),
            (re.compile(r"^trunk_conv\.(weight|bias)$"), r"conv2.\1"),
            (re.compile(r"^upconv1\.(weight|bias)$"), r"upsample1.\1"),
            (re.compile(r"^upconv2\.(weight|bias)$"), r"upsample2.\1"),
            (re.compile(r"^HRconv\.(weight|bias)$"), r"conv3.0.\1"),
            (re.compile(r"^conv_last\.(weight|bias)$"), r"conv4.\1"),
        ]
    elif any(k.startswith("body.") for k in keys):
        w = sd.get("conv_first.weight")
        if w is not None and _np(w).shape[1] != 3:
            raise ValueError(
                "BasicSR RRDBNet with a pixel-unshuffled input "
                f"(conv_first expects {_np(w).shape[1]} channels) — "
                "these 1x/2x Real-ESRGAN variants have no counterpart "
                "in this generator; only 4x RGB-input models load"
            )
        rules = [
            (re.compile(r"^conv_first\.(weight|bias)$"), r"conv1.\1"),
            (re.compile(r"^body\.(\d+)\.rdb(\d)\.(conv[1-4])"
                        r"\.(weight|bias)$"),
             r"blocks.\1.RDB\2.\3.0.\4"),
            (re.compile(r"^body\.(\d+)\.rdb(\d)\.conv5\.(weight|bias)$"),
             r"blocks.\1.RDB\2.conv5.\3"),
            (re.compile(r"^conv_body\.(weight|bias)$"), r"conv2.\1"),
            (re.compile(r"^conv_up1\.(weight|bias)$"), r"upsample1.\1"),
            (re.compile(r"^conv_up2\.(weight|bias)$"), r"upsample2.\1"),
            (re.compile(r"^conv_hr\.(weight|bias)$"), r"conv3.0.\1"),
            (re.compile(r"^conv_last\.(weight|bias)$"), r"conv4.\1"),
        ]
    if rules is None:
        return sd

    out: dict = {}
    unmapped = []
    for key, value in sd.items():
        for pat, repl in rules:
            new, n = pat.subn(repl, key)
            if n:
                out[new] = value
                break
        else:
            unmapped.append(key)
    if unmapped:
        raise ValueError(
            "external ESRGAN checkpoint has keys this converter does "
            f"not recognize: {sorted(unmapped)[:8]}"
        )
    return out


EXPORT_SCHEMES = ("reference", "rrdbnet", "basicsr")


def externalize_esrgan_sd(
    sd: Mapping[str, Any], scheme: str
) -> dict:
    """Reference-named ESRGAN state_dict -> a public RRDBNet naming.

    The outbound counterpart of :func:`_canonical_esrgan_sd`: lets a
    generator trained here run in xinntao's ESRGAN ("rrdbnet", the
    new-arch module names) or BasicSR/Real-ESRGAN ("basicsr")
    toolchains.  "reference" passes through unchanged.
    """
    import re

    if scheme not in EXPORT_SCHEMES:
        raise ValueError(
            f"unknown scheme {scheme!r} (choose from {EXPORT_SCHEMES})"
        )
    if scheme == "reference":
        return dict(sd)
    if scheme == "rrdbnet":
        block = (r"^blocks\.(\d+)\.(RDB\d)\.(conv\d)(?:\.0)?\.",
                 r"RRDB_trunk.\1.\2.\3.")
        heads = (
            ("conv1.", "conv_first."), ("conv2.", "trunk_conv."),
            ("upsample1.", "upconv1."), ("upsample2.", "upconv2."),
            ("conv3.0.", "HRconv."), ("conv4.", "conv_last."),
        )
    else:  # basicsr
        block = (r"^blocks\.(\d+)\.RDB(\d)\.(conv\d)(?:\.0)?\.",
                 r"body.\1.rdb\2.\3.")
        heads = (
            ("conv1.", "conv_first."), ("conv2.", "conv_body."),
            ("upsample1.", "conv_up1."), ("upsample2.", "conv_up2."),
            ("conv3.0.", "conv_hr."), ("conv4.", "conv_last."),
        )
    out = {}
    pat = re.compile(block[0])
    for key, value in sd.items():
        new, n = pat.subn(block[1], key)
        if not n:
            for prefix, repl in heads:
                if new.startswith(prefix):
                    new = repl + new[len(prefix):]
                    break
            else:
                raise ValueError(
                    f"cannot externalize key {key!r} (not a reference-"
                    f"named ESRGAN generator state_dict)"
                )
        out[new] = value
    return out


def convert_esrgan_generator(state_dict: Mapping[str, Any]) -> dict:
    """ESRGAN generator state_dict -> flax variables dict.

    Accepts the reference's module names (esrgan/generator.py:35-52,
    residual.py:17-129) plus the public RRDBNet schemes (see
    :func:`_canonical_esrgan_sd`).
    """
    sd = _canonical_esrgan_sd(strip_ddp_prefix(state_dict))
    params: dict = {}

    params["conv1"] = _conv(sd, "conv1")

    num_blocks = len(
        {k.split(".")[1] for k in sd if k.startswith("blocks.")}
    )
    for i in range(num_blocks):
        rrdb: dict = {}
        for j in range(1, 4):
            p = f"blocks.{i}.RDB{j}"
            rdb: dict = {}
            for c in range(1, 5):
                rdb[f"conv{c}"] = _conv(sd, f"{p}.conv{c}.0")
            rdb["conv5"] = _conv(sd, f"{p}.conv5")
            rrdb[f"rdb{j}"] = rdb
        params[f"block{i}"] = rrdb

    params["conv2"] = _conv(sd, "conv2")
    params["upsample1"] = _conv(sd, "upsample1")
    params["upsample2"] = _conv(sd, "upsample2")
    params["conv3"] = _conv(sd, "conv3.0")
    params["conv4"] = _conv(sd, "conv4")
    return {"params": params}


def _convert_discriminator(
    state_dict: Mapping[str, Any],
    conv_indices: list[int],
    bn_indices: list[int | None],
    fc_indices: tuple[int, int],
    feature_map_hw: int,
) -> dict:
    """Shared torch->flax conversion for both reference discriminators.

    ``conv_indices``/``bn_indices``: torch nn.Sequential indices of each
    conv stage's Conv2d / BatchNorm2d (None = no BN, first stage);
    ``fc_indices``: classifier Sequential indices of the two Linears;
    ``feature_map_hw``: spatial size of the final conv map, needed to
    permute the first Linear's input axis from the reference's CHW
    flattening (torch.flatten, srgan/discriminator.py:84) to our HWC.
    """
    sd = strip_ddp_prefix(state_dict)
    params: dict = {}
    stats: dict = {}
    for i, (ci, bi) in enumerate(zip(conv_indices, bn_indices)):
        params[f"conv{i}"] = _conv(
            sd, f"features.{ci}", bias=bi is None
        )
        if bi is not None:
            params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"features.{bi}")
    params["fc1"] = _linear(
        sd, f"classifier.{fc_indices[0]}",
        chw=(512, feature_map_hw, feature_map_hw),
    )
    params["fc2"] = _linear(sd, f"classifier.{fc_indices[1]}")
    return {"params": params, "batch_stats": stats}


def convert_srgan_discriminator(
    state_dict: Mapping[str, Any], image_size: int = 96
) -> dict:
    """Reference SRGAN discriminator state_dict -> flax variables
    (torch layout: srgan/discriminator.py:31-69; 8 conv stages, BN on
    all but the first, Linear(...->1024)->Linear(1024->1))."""
    conv_indices = [0, 2, 5, 8, 11, 14, 17, 20]
    bn_indices = [None, 3, 6, 9, 12, 15, 18, 21]
    return _convert_discriminator(
        state_dict, conv_indices, bn_indices, (0, 2), image_size // 16
    )


def convert_esrgan_discriminator(
    state_dict: Mapping[str, Any], image_size: int = 128
) -> dict:
    """Reference ESRGAN discriminator state_dict -> flax variables
    (torch layout: esrgan/discriminator.py:31-76; 10 conv stages,
    Linear(...->100)->Linear(100->1), logits head)."""
    conv_indices = [0, 2, 5, 8, 11, 14, 17, 20, 23, 26]
    bn_indices = [None, 3, 6, 9, 12, 15, 18, 21, 24, 27]
    return _convert_discriminator(
        state_dict, conv_indices, bn_indices, (0, 2), image_size // 32
    )


def convert_vgg19(state_dict: Mapping[str, Any]) -> dict:
    """torchvision VGG19 state_dict -> VGG19Features flax variables.

    Accepts either a full torchvision ``vgg19`` state_dict
    (``features.{idx}.weight``) or the bare hub checkpoint file contents.
    Only the 16 convs through relu5_4 (features[:36]) are used, matching
    the reference's truncation (srgan/loss.py:31).
    """
    sd = {k: v for k, v in state_dict.items()}
    # torchvision layer indices of the conv layers in features[:36]
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 16,
                    19, 21, 23, 25, 28, 30, 32, 34]
    params = {}
    for our_idx, torch_idx in enumerate(conv_indices):
        params[f"conv{our_idx}"] = _conv(sd, f"features.{torch_idx}")
    return {"params": params}


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pth`` file (CPU) and return the raw object."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# --------------------------------------------------------------------
# Reverse direction: flax variables -> reference-layout state_dict
# (lets checkpoints trained here round-trip back into the reference).
# --------------------------------------------------------------------


def _t(arr) -> "object":
    import torch

    return torch.from_numpy(
        np.ascontiguousarray(np.asarray(arr)).copy()
    )


def _conv_back(params: Mapping[str, Any], prefix: str, sd: dict) -> None:
    conv = params["conv"]
    sd[f"{prefix}.weight"] = _t(
        np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
    )
    if "bias" in conv:
        sd[f"{prefix}.bias"] = _t(conv["bias"])


def _bn_back(
    params: Mapping[str, Any], stats: Mapping[str, Any],
    prefix: str, sd: dict,
) -> None:
    import torch

    sd[f"{prefix}.weight"] = _t(params["bn"]["scale"])
    sd[f"{prefix}.bias"] = _t(params["bn"]["bias"])
    sd[f"{prefix}.running_mean"] = _t(stats["bn"]["mean"])
    sd[f"{prefix}.running_var"] = _t(stats["bn"]["var"])
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)


def export_srgan_generator(variables: Mapping[str, Any]) -> dict:
    """Our SRGAN generator variables -> reference-layout state_dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict = {}
    _conv_back(params["conv1"], "conv1.0", sd)
    sd["conv1.1.weight"] = _t(params["prelu1"]["alpha"])

    blocks = sorted(
        (k for k in params if k.startswith("block")),
        key=lambda k: int(k[len("block"):]),
    )
    for i, key in enumerate(blocks):
        bp, bs = params[key], stats[key]
        _conv_back(bp["conv1"], f"blocks.{i}.conv1", sd)
        _bn_back(bp["bn1"], bs["bn1"], f"blocks.{i}.bn1", sd)
        sd[f"blocks.{i}.prelu.weight"] = _t(bp["prelu"]["alpha"])
        _conv_back(bp["conv2"], f"blocks.{i}.conv2", sd)
        _bn_back(bp["bn2"], bs["bn2"], f"blocks.{i}.bn2", sd)

    _conv_back(params["conv2"], "conv2.0", sd)
    _bn_back(params["bn2"], stats["bn2"], "conv2.1", sd)
    ups = sorted(
        (k for k in params if k.startswith("upsample")),
        key=lambda k: int(k[len("upsample"):]),
    )
    for i, key in enumerate(ups):
        _conv_back(params[key]["conv"], f"conv_layers.{i}.conv", sd)
        sd[f"conv_layers.{i}.prelu.weight"] = _t(
            params[key]["prelu"]["alpha"]
        )
    _conv_back(params["conv3"], "conv3", sd)
    return sd


def export_esrgan_generator(variables: Mapping[str, Any]) -> dict:
    """Our ESRGAN generator variables -> reference-layout state_dict."""
    params = variables["params"]
    sd: dict = {}
    _conv_back(params["conv1"], "conv1", sd)
    blocks = sorted(
        (k for k in params if k.startswith("block")),
        key=lambda k: int(k[len("block"):]),
    )
    for i, key in enumerate(blocks):
        for j in range(1, 4):
            rdb = params[key][f"rdb{j}"]
            for c in range(1, 5):
                _conv_back(
                    rdb[f"conv{c}"], f"blocks.{i}.RDB{j}.conv{c}.0", sd
                )
            _conv_back(rdb["conv5"], f"blocks.{i}.RDB{j}.conv5", sd)
    _conv_back(params["conv2"], "conv2", sd)
    _conv_back(params["upsample1"], "upsample1", sd)
    _conv_back(params["upsample2"], "upsample2", sd)
    _conv_back(params["conv3"], "conv3.0", sd)
    _conv_back(params["conv4"], "conv4", sd)
    return sd
