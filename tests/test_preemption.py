"""Preemption-safe training: SIGTERM -> full checkpoint -> clean exit.

The reference loses all progress since the last epoch boundary on a
scheduler preemption (checkpoints only inside ``_test``, reference
srgan/trainer.py:321-327, and no signal handling anywhere).  Here a
SIGTERM latches a flag; the epoch loops checkpoint the FULL training
state at the next step boundary and exit cleanly (utils/preemption.py).
Covered: the guard itself, the in-process trainer path (hooked via the
per-step profiler callback), and the real CLI + real SIGTERM in a
subprocess.
"""

import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest
from PIL import Image

from torchsr_tpu.utils.checkpoint import load_checkpoint
from torchsr_tpu.utils.preemption import PreemptionGuard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_guard_latches_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard().install()
    try:
        assert guard.active
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)
        # Delivery is synchronous for a self-signal on the main thread:
        # the Python-level handler runs before the next bytecode batch.
        for _ in range(100):
            if guard.requested:
                break
            time.sleep(0.01)
        assert guard.requested
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_inert_off_main_thread():
    """signal.signal is illegal off the main thread; the guard must
    degrade to a no-op there, not raise."""
    result = {}

    def worker():
        g = PreemptionGuard().install()
        result["active"] = g.active
        result["requested"] = g.requested
        g.uninstall()

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert result == {"active": False, "requested": False}


@pytest.mark.slow
def test_trainer_preemption_saves_full_state(image_dir, tmp_path,
                                             monkeypatch):
    """SIGTERM during pretrain epoch 2 of 3: the trainer writes
    ``srgan-psnr-latest.ckpt`` AT epoch 2 with the lossless-resume
    extras, skips the GAN phase, and train() returns cleanly."""
    from tests.test_trainer import _args, _make_trainer

    monkeypatch.chdir(tmp_path)
    args = _args(model="srgan", pretrain_epochs=3, epochs=1)
    trainer = _make_trainer(image_dir, args)
    assert trainer.preempt_save

    calls = {"n": 0}
    orig_step = trainer.profiler.step

    def hooked_step(k=1):
        calls["n"] += 1
        if calls["n"] == 2:  # 1 step/epoch here: fires in epoch 2
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_step(k)

    trainer.profiler.step = hooked_step
    trainer.train()  # returns (no exception): preempted + handled

    ckpt = load_checkpoint("srgan-psnr-latest.ckpt")
    assert ckpt is not None
    assert ckpt["epoch"] == 2  # resume re-runs the interrupted epoch
    assert ckpt["phase"] == "srgan-psnr"
    assert "extra" in ckpt  # full state, not just generator weights
    assert "gen_opt_state" in ckpt["extra"]
    # The GAN phase never started and SIGTERM handling is uninstalled.
    assert not os.path.exists("srgan-gan-latest.ckpt")
    assert trainer._preemption is None

    # The saved checkpoint resumes: a fresh trainer restores epoch 2.
    trainer2 = _make_trainer(image_dir, args)
    assert trainer2._restore(ckpt, "psnr") == 2


@pytest.mark.slow
def test_no_preempt_save_flag_disables_handler(image_dir, tmp_path,
                                               monkeypatch):
    from tests.test_trainer import _args, _make_trainer

    monkeypatch.chdir(tmp_path)
    args = _args(model="srgan", no_preempt_save=True)
    trainer = _make_trainer(image_dir, args)
    assert not trainer.preempt_save


@pytest.mark.slow
def test_cli_sigterm_checkpoints_and_exits_zero(tmp_path):
    """The real contract end to end: ``torchsr train`` in a subprocess,
    a real SIGTERM mid-pretrain, exit code 0 within the grace period,
    and a resumable ``-latest`` checkpoint on disk."""
    ds = tmp_path / "ds"
    ds.mkdir()
    rng = np.random.default_rng(3)
    for i in range(12):
        arr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(ds / f"img_{i}.png")

    run = tmp_path / "run"
    run.mkdir()
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "torchsr_tpu", "train",
            "--train-dir", str(ds), "--model", "srgan",
            "--batch-size", "8", "--pretrain-epochs", "500",
            "--epochs", "1", "--crop-size", "32", "--gen-blocks", "1",
            "--vgg-convs", "2", "--disable-amp", "--skip-image-save",
            "--data-workers", "2", "--seed", "1",
        ],
        env=env, cwd=str(run), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        # Epoch-end eval writes psnr-latest; SIGTERM once training is
        # demonstrably past compile and into the epoch loop.
        ckpt_path = run / "srgan-psnr-latest.ckpt"
        deadline = time.time() + 420
        while time.time() < deadline and not ckpt_path.exists():
            assert proc.poll() is None, proc.stdout.read()
            time.sleep(1.0)
        assert ckpt_path.exists(), "no epoch checkpoint within deadline"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, out[-2000:]
    assert "Preemption signal received" in out, out[-2000:]
    ckpt = load_checkpoint(str(ckpt_path))
    assert ckpt["phase"] == "srgan-psnr"
    assert "extra" in ckpt
