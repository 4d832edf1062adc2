"""Utility subsystem tests: prefetch, profiler, checkpoint helpers."""

import os

import numpy as np
import pytest

from torchsr_tpu.data.prefetch import prefetch_to_device
from torchsr_tpu.parallel.mesh import make_mesh
from torchsr_tpu.utils.checkpoint import (
    find_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from torchsr_tpu.utils.image_io import save_image, to_uint8
from torchsr_tpu.utils.profiling import StepProfiler


def test_prefetch_to_device_order_and_values():
    mesh = make_mesh()
    batches = [
        (np.full((8, 4), i, np.float32), np.full((8,), i, np.float32))
        for i in range(5)
    ]
    out = list(prefetch_to_device(iter(batches), mesh))
    assert len(out) == 5
    for i, (a, b) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(a), batches[i][0])
        np.testing.assert_array_equal(np.asarray(b), batches[i][1])


def test_prefetch_propagates_producer_errors():
    mesh = make_mesh()

    def bad_iter():
        yield (np.zeros((8, 2), np.float32),)
        raise RuntimeError("decode failed")

    it = prefetch_to_device(bad_iter(), mesh)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(it)


def test_step_profiler_writes_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    profiler = StepProfiler(2, str(tmp_path / "traces"))
    f = jax.jit(lambda x: x * 2)
    for _ in range(8):
        f(jnp.ones((4,)))
        profiler.step()
    profiler.stop()
    trace_root = tmp_path / "traces"
    assert trace_root.exists()
    # jax writes plugins/profile/<ts>/*.trace.json.gz or xplane files
    found = [p for p in trace_root.rglob("*") if p.is_file()]
    assert found, "profiler produced no trace files"


def test_step_profiler_disabled_noop():
    profiler = StepProfiler(0, "nowhere")
    for _ in range(3):
        profiler.step()
    profiler.stop()  # no error, nothing written


def test_checkpoint_roundtrip_and_find(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    state = {"params": {"w": np.arange(6, np.float32).reshape(2, 3)
                        if False else np.arange(6, dtype=np.float32).reshape(2, 3)}}
    save_checkpoint("m-psnr-latest.ckpt", 5, "m-psnr", state,
                    extra={"best_psnr": 31.5})
    loaded = load_checkpoint("m-psnr-latest.ckpt")
    assert loaded["epoch"] == 5
    assert loaded["phase"] == "m-psnr"
    np.testing.assert_array_equal(
        loaded["state"]["params"]["w"], state["params"]["w"]
    )
    assert loaded["extra"]["best_psnr"] == 31.5

    assert find_checkpoint("missing.ckpt", "m-psnr-latest.ckpt") == \
        "m-psnr-latest.ckpt"
    assert find_checkpoint("missing.ckpt") is None
    assert load_checkpoint(None) is None


def test_image_io_roundtrip(tmp_path):
    arr = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "sub" / "img.png")
    save_image(arr, path)  # creates the directory
    assert os.path.exists(path)
    u8 = to_uint8(arr)
    assert u8.dtype == np.uint8
    # round-half rounding
    assert to_uint8(np.array([[[0.5 / 255]]]))[0, 0, 0] == 1


def test_match_tree_is_key_aware():
    """Key-aware restoration: reordered dict keys map by NAME, mismatched
    key sets raise — never a silent positional transpose."""
    import pytest

    from torchsr_tpu.train.trainer import _match_tree

    template = {
        "alpha": np.zeros((2, 2), np.float32),
        "beta": np.zeros((2, 2), np.float32),
    }
    # Reordered (and reversed-value) loaded dict: values must follow keys.
    loaded = {
        "beta": np.full((2, 2), 7.0),
        "alpha": np.full((2, 2), 3.0),
    }
    out = _match_tree(template, loaded)
    assert float(out["alpha"][0, 0]) == 3.0
    assert float(out["beta"][0, 0]) == 7.0

    # Same leaf count, different key names: must raise, not transpose.
    with pytest.raises(ValueError):
        _match_tree(template, {"alpha": loaded["alpha"],
                               "gamma": loaded["beta"]})

    # Size-incompatible leaf: must raise, not reshape garbage.
    with pytest.raises(ValueError):
        _match_tree(template, {"alpha": np.zeros((3, 3)),
                               "beta": loaded["beta"]})


def test_step_profiler_tpu_fallback_cadence_summary(tmp_path, monkeypatch):
    """On a TPU backend without TORCHSR_FORCE_PROFILE, the profiler
    degrades to a step-cadence summary file instead of doing nothing
    (jax.profiler.start_trace hangs on some TPU runtimes)."""
    import json
    import time

    import jax

    monkeypatch.delenv("TORCHSR_FORCE_PROFILE", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    class Log:
        lines: list = []

        def log(self, s):
            self.lines.append(s)

    logger = Log()
    profiler = StepProfiler(4, str(tmp_path / "traces"), logger=logger)
    for _ in range(10):
        time.sleep(0.002)
        profiler.step()
    profiler.stop()
    path = tmp_path / "traces" / "step_times.json"
    assert path.exists(), logger.lines
    summary = json.loads(path.read_text())
    assert summary["steps_timed"] == 4
    assert summary["mean_ms"] >= 1.0
    assert summary["p90_ms"] >= summary["p50_ms"]
    assert any("step-cadence" in l.lower() for l in logger.lines)
    assert any("Step-cadence summary" in l for l in logger.lines)


def test_step_profiler_cadence_divides_by_fused_k(tmp_path, monkeypatch):
    """Multi-step jitted calls stamp ONCE per call with k attached;
    per-step times are the call delta / k (round-5 advisor fix: K
    back-to-back step() calls used to produce ~0 intra-burst deltas)."""
    import time

    import jax

    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("TORCHSR_FORCE_PROFILE", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    profiler = StepProfiler(16, str(tmp_path / "traces"))
    for _ in range(8):
        time.sleep(0.004)  # one "jitted call" of 4 fused steps
        profiler.step(4)
    profiler.stop()
    import json

    summary = json.loads(
        (tmp_path / "traces" / "step_times.json").read_text()
    )
    assert summary["steps_timed"] == 16
    assert summary["calls_timed"] == 4
    # 4 ms call / 4 fused steps ~= 1 ms/step; the pre-fix behavior
    # reported p50 ~0 (intra-burst) and mean ~1/4 of the call time.
    assert 0.8 <= summary["p50_ms"] <= 20.0
    assert summary["p50_ms"] >= 0.8
