"""``torchsr doctor`` — environment and setup diagnostics.

The torch ecosystem's ``collect_env`` analogue, tuned for this stack's
actual failure modes: a missing TPU plugin (PYTHONPATH overwritten), a
cold persistent compile cache (first GAN-step compiles are minutes), a
dataset directory with no readable images, stale env knobs, and
checkpoint/working-directory confusion.  Everything is best-effort: a
diagnostics tool must never crash on the broken setups it exists to
explain, so each probe degrades to an ``error:`` string.

No reference equivalent (the reference offers no env tooling); kept
out of the training import path — only the CLI imports it.
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time
from typing import Any

# Every env knob the framework reads, with one-line meanings.
_KNOBS = {
    "TORCHSR_COMPILE_CACHE": "persistent XLA cache dir (0 disables)",
    "TORCHSR_RDB_BWD": "fused-RDB backward backend (pallas|xla)",
    "TORCHSR_RDB_EXT": "extended-row RDB buffer (measured negative)",
    "TORCHSR_ADAM": "optimizer layout experiment knob",
    "TORCHSR_FORCE_PROFILE": "enable StepProfiler despite platform hang",
    "JAX_PLATFORMS": "backend override (cpu|tpu|...)",
    "XLA_FLAGS": "XLA options (e.g. host device count)",
}


def _versions() -> dict:
    from torchsr_tpu.__version__ import VERSION

    out = {
        "torchsr_tpu": VERSION,
        "python": platform.python_version(),
    }
    for mod in ("jax", "jaxlib", "flax", "optax", "numpy"):
        try:
            out[mod] = __import__(mod).__version__
        except Exception as e:  # pragma: no cover
            out[mod] = f"error: {e}"
    return out


def _devices() -> dict:
    try:
        import jax

        devs = jax.devices()
        return {
            "backend": jax.default_backend(),
            "devices": [
                f"{d.device_kind} (id={d.id}, process={d.process_index})"
                for d in devs
            ],
            "process_count": jax.process_count(),
            "process_index": jax.process_index(),
        }
    except Exception as e:
        return {
            "backend": f"error: {e}",
            "hint": (
                "if this names a missing plugin backend, PYTHONPATH "
                "was probably overwritten — the TPU plugin rides on "
                "it; extend with PYTHONPATH=/path/to/repo:$PYTHONPATH"
            ),
        }


def _device_sanity(timeout_s: float = 120.0) -> dict:
    """One tiny matmul with a scalar readback, timed, under a watchdog.

    Proves dispatch + compile + readback work; the time is dominated by
    compile on a cold process and says nothing about throughput (use
    bench.py for that).  The watchdog exists because the dev tunnel's
    device service can wedge while its compile service stays healthy —
    a blocked readback then hangs any client forever (observed live:
    training froze mid-step, new clients froze at first dispatch).  A
    daemon thread cannot interrupt the blocked C call, but it CAN let
    doctor report "device unresponsive" instead of becoming the next
    hung process."""
    import threading

    box: dict = {}

    def run():
        box.update(_device_sanity_inner())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return {
            "ok": False,
            "error": (
                f"device unresponsive: probe still blocked after "
                f"{timeout_s:.0f}s"
            ),
            "hint": (
                "dispatch/readback is hanging, not failing — on the "
                "tunneled dev TPU this means the device service is "
                "down or wedged by a stuck client (the compile "
                "endpoint can stay healthy).  Kill stale TPU client "
                "processes by PID and retry; if it persists, the "
                "terminal side must recover on its own."
            ),
        }
    return box


def _device_sanity_inner() -> dict:
    try:
        import jax
        import numpy as np

        try:
            # Without the persistent cache even this one-op program
            # compiles from scratch through the tunnel (measured 149 s
            # cold on the dev TPU); with it, reruns are sub-second.
            from torchsr_tpu.utils.compile_cache import (
                enable_compilation_cache,
            )

            enable_compilation_cache()
        except Exception:
            pass
        t0 = time.perf_counter()

        # ONE jitted program (eager mode compiles each primitive as its
        # own program — measured 3x ~40 s through the dev tunnel — and
        # tiny eager compiles bypass the persistent cache).
        @jax.jit
        def _probe(x):
            return (x @ x).mean()

        # numpy input: device_put is a transfer, not an eager compile
        val = float(_probe(np.ones((256, 256), np.float32)))
        ms = (time.perf_counter() - t0) * 1e3
        ok = abs(val - 256.0) < 1e-3
        out = {"ok": ok, "roundtrip_ms": round(ms, 1)}
        if ms > 5_000:
            out["hint"] = (
                "time is first-compile dominated; rerun to measure "
                "the cached path, or skip with --no-device-check"
            )
        return out
    except Exception as e:
        return {"ok": False, "error": str(e)}


def _compile_cache() -> dict:
    env = os.environ.get("TORCHSR_COMPILE_CACHE")
    if env == "0":
        return {"enabled": False, "reason": "TORCHSR_COMPILE_CACHE=0"}
    path = env or os.path.expanduser("~/.cache/torchsr_tpu/xla")
    info: dict[str, Any] = {"enabled": True, "path": path}
    try:
        entries = os.listdir(path) if os.path.isdir(path) else []
        size = sum(
            os.path.getsize(os.path.join(path, f))
            for f in entries
            if os.path.isfile(os.path.join(path, f))
        )
        info["entries"] = len(entries)
        info["size_mb"] = round(size / 1e6, 1)
        if not entries:
            info["hint"] = (
                "cache is cold: first ESRGAN GAN-step compiles take "
                "minutes; reruns are seconds once warmed"
            )
    except Exception as e:
        info["error"] = str(e)
    return info


def _env_knobs() -> dict:
    return {
        k: {"value": os.environ.get(k), "meaning": v}
        for k, v in _KNOBS.items()
        if os.environ.get(k) is not None
    }


def _distributed_env() -> dict:
    keys = (
        "RANK", "WORLD_SIZE", "MASTER_ADDR", "MASTER_PORT",
        "SLURM_PROCID", "SLURM_NTASKS", "SLURM_STEP_NODELIST",
    )
    present = {k: os.environ[k] for k in keys if k in os.environ}
    return present or {"mode": "single-process (no torchrun/Slurm env)"}


def _checkpoints(cwd: str) -> list[str]:
    names = []
    try:
        for f in sorted(os.listdir(cwd)):
            if f.endswith((".ckpt", ".pth", ".pt", ".shlo")):
                size = os.path.getsize(os.path.join(cwd, f))
                names.append(f"{f} ({size / 1e6:.1f} MB)")
    except Exception as e:
        names.append(f"error: {e}")
    return names


def _dataset(train_dir: str | None) -> dict:
    if not train_dir:
        return {"skipped": "pass --train-dir to check a dataset"}
    try:
        from torchsr_tpu.data.discovery import (
            discover_images,
            split_dataset,
        )
        from torchsr_tpu.data.packed import PackedDataset, is_pack

        if is_pack(train_dir):
            names = PackedDataset(train_dir).names
            train, test = split_dataset(names)
            return {
                "path": train_dir,
                "format": "tsrpack archive (zero-decode mmap)",
                "train_images": len(train),
                "val_images": len(test),
            }
        train, test = split_dataset(discover_images(train_dir))
        return {
            "path": train_dir,
            "train_images": len(train),
            "val_images": len(test),
        }
    except Exception as e:
        return {"path": train_dir, "error": str(e)}


def _checkpoint_info(path: str | None) -> dict:
    """What's in this checkpoint file?  Host-only (no device needed):
    format, training metadata, and the architecture the inference path
    would size itself to (infer/runner.py:66-84's detection rules)."""
    if not path:
        return {"skipped": "pass --checkpoint to inspect a file"}
    import numpy as np

    try:
        from torchsr_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        if ckpt is None:
            return {"path": path, "error": "file not found"}
        state = ckpt["state"]
        params = state.get("params", state)
        leaves = [np.asarray(x) for x in _tree_leaves(params)]
        num_blocks = len(
            [k for k in params if str(k).startswith("block")]
        )
        n_up = len([k for k in params if str(k).startswith("upsample")])
        extras = ckpt.get("extra") or {}
        return {
            "path": path,
            "format": "torch .pth (converted)"
            if path.endswith((".pth", ".pt")) else "msgpack .ckpt",
            "epoch": ckpt.get("epoch"),
            "phase": ckpt.get("phase") or "(none)",
            "generator_params": int(
                sum(leaf.size for leaf in leaves)
            ),
            "detected_blocks": num_blocks,
            "detected_scale": 2 ** n_up if n_up else 4,
            "has_batch_stats": bool(state.get("batch_stats")),
            "lossless_extras": sorted(extras) or
            "none (weights-only: cross-phase or external checkpoint)",
        }
    except Exception as e:
        return {"path": path, "error": f"{type(e).__name__}: {e}"}


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def collect_report(
    train_dir: str | None = None,
    device_check: bool = True,
    checkpoint: str | None = None,
) -> dict:
    report = {
        "versions": _versions(),
        "platform": f"{platform.system()} {platform.release()}",
        "runtime": _devices(),
        "compile_cache": _compile_cache(),
        "env_knobs": _env_knobs() or {"none set": "defaults active"},
        "distributed_env": _distributed_env(),
        "cwd_checkpoints": _checkpoints(os.getcwd())
        or ["none (train first, or pass --checkpoint paths explicitly)"],
        "dataset": _dataset(train_dir),
        "checkpoint": _checkpoint_info(checkpoint),
    }
    if device_check:
        report["device_sanity"] = _device_sanity()
    return report


def _print_tree(d: dict, indent: int = 0) -> None:
    pad = "  " * indent
    for key, val in d.items():
        if isinstance(val, dict):
            print(f"{pad}{key}:")
            _print_tree(val, indent + 1)
        elif isinstance(val, list):
            print(f"{pad}{key}:")
            for item in val:
                print(f"{pad}  - {item}")
        else:
            print(f"{pad}{key}: {val}")


def run_doctor(args) -> dict:
    report = collect_report(
        train_dir=getattr(args, "train_dir", None),
        device_check=not getattr(args, "no_device_check", False),
        checkpoint=getattr(args, "checkpoint", None),
    )
    if getattr(args, "json", False):
        print(json.dumps(report, indent=2, default=str))
    else:
        print("torchsr-tpu doctor")
        print("=" * 18)
        _print_tree(report)
        sanity = report.get("device_sanity", {})
        runtime_ok = "error" not in str(report["runtime"].get("backend"))
        verdict = (
            "OK" if runtime_ok and sanity.get("ok", True) else "PROBLEMS"
        )
        print(f"\nverdict: {verdict}")
    if "unresponsive" in str(
        report.get("device_sanity", {}).get("error", "")
    ):
        # The probe thread is still blocked inside the runtime; a
        # normal interpreter shutdown would abort ("exception not
        # rethrown") AFTER the report — exit hard instead.
        sys.stdout.flush()
        os._exit(3)
    return report
