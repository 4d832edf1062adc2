"""Preemption-safe training: SIGTERM -> checkpoint -> clean exit.

TPU pods, Slurm jobs, and GKE/Borg-style schedulers preempt training
processes with SIGTERM plus a short grace period.  The reference
checkpoints only at epoch boundaries (inside ``_test``, reference
srgan/trainer.py:321-327) and installs no signal handling, so a
preemption loses every step since the last epoch — on DIV2K-scale
epochs that is minutes, on production datasets it can be hours.

``PreemptionGuard`` installs a handler that merely sets a flag; the
trainer epoch loops poll it between jitted step calls (the only safe
point: the live ``GANTrainState`` is consistent there) and, when set,
write the full ``-latest`` checkpoint and raise ``TrainingPreempted``.
``GANTrainer.train`` catches it, logs, and returns cleanly so the CLI
exits 0 within the grace period.

Semantics on resume match the reference's resume-at-epoch rule
(srgan/trainer.py:367, :501): the interrupted epoch is re-run from its
start.  The saved state is mid-epoch, so the re-run applies some
updates twice — exactly the trade the reference makes for its own
epoch-boundary checkpoints, and harmless for SGD-family training.

Multi-process notes: standard launchers (Slurm, GKE, torchrun-style
supervisors) deliver SIGTERM to every rank.  Each process raises
``TrainingPreempted`` at its own next step boundary; only the main
process writes the checkpoint (``GANTrainer._save`` is rank-gated).
Because all ranks run the same number of steps per epoch, every rank
reaches a boundary without waiting on a collective whose peers have
already exited, provided the launcher signals all ranks (it does).

Signal handlers can only be installed from the main thread; elsewhere
(library embedding, notebook executors) the guard degrades to an
inert no-op rather than failing.
"""

from __future__ import annotations

import signal
from typing import Iterable


class TrainingPreempted(Exception):
    """Raised at a step boundary after the preemption save completed."""


class PreemptionGuard:
    """Latches termination signals into a pollable flag.

    Usage::

        guard = PreemptionGuard().install()
        try:
            ...  # poll guard.requested between steps
        finally:
            guard.uninstall()
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous: dict = {}
        self._requested = False
        self._active = False

    # ------------------------------------------------------------------
    def install(self) -> "PreemptionGuard":
        try:
            for sig in self._signals:
                self._previous[sig] = signal.signal(sig, self._latch)
            self._active = True
        except ValueError:
            # Not the main thread: signal.signal is illegal here.  Run
            # inert — training works, preemption saves don't.  Restore
            # anything already swapped before the failure.
            self.uninstall()
        return self

    def uninstall(self) -> None:
        for sig, prev in self._previous.items():
            try:
                signal.signal(sig, prev)
            except ValueError:  # pragma: no cover - thread teardown
                pass
        self._previous.clear()
        self._active = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()

    # ------------------------------------------------------------------
    def _latch(self, signum, frame) -> None:
        self._requested = True

    @property
    def active(self) -> bool:
        """True when handlers are actually installed."""
        return self._active

    @property
    def requested(self) -> bool:
        """True once a watched signal has been received."""
        return self._requested
