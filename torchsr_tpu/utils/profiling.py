"""Optional step profiling via jax.profiler, with a TPU-safe fallback.

The reference's only performance instrumentation is wall-clock epoch
throughput (srgan/trainer.py:374, :401-403); SURVEY.md section 5 calls
for keeping that metric and adding an optional ``jax.profiler.trace``
window.  ``StepProfiler`` captures a TensorBoard-compatible device trace
of N hot-loop steps (skipping the compile step), written to
``--profile-dir``.

On TPU runtimes where ``jax.profiler.start_trace`` is unsafe (this
repo's dev platform hangs inside it; opt back in with
``TORCHSR_FORCE_PROFILE=1``), the same window degrades to a
**step-cadence summary** instead of doing nothing: per-jitted-call
wall-clock deltas of the hot loop, divided by each call's fused step
count K (mean/p50/p90/max, steps/sec), written to
``<profile-dir>/step_times.json``.  Caveat recorded in the file: these
are host-side call cadences — they track device step time only when
the loop consumes per-call results, which the production loops do only
when wandb logging is active; otherwise dispatch is async and the
cadence can read below real device step time.  For device-side section
anatomy use tools/profile_gan_step.py.
"""

from __future__ import annotations

import json
import os
import time


class StepProfiler:
    """Trace (or time) a window of train steps, once per run."""

    # Skip the first steps: they include compilation and warm-up.
    START_AT_STEP = 2

    def __init__(self, num_steps: int, out_dir: str, logger=None) -> None:
        self.num_steps = num_steps or 0
        self.out_dir = out_dir or "traces"
        self.logger = logger
        self._seen = 0
        self._tracing = False
        self._timing = False
        self._stamps: list[float] = []
        self._done = self.num_steps <= 0

    def _start(self) -> None:
        import jax

        if (
            jax.default_backend() not in ("cpu", "gpu")
            and os.environ.get("TORCHSR_FORCE_PROFILE") != "1"
        ):
            # Some TPU runtimes (including this repo's dev platform)
            # hang inside start_trace; fall back to the step-cadence
            # summary rather than wedging a real training run (or
            # silently doing nothing).
            if self.logger is not None:
                self.logger.log(
                    "TPU backend: falling back to step-cadence timing "
                    "(jax.profiler.start_trace hangs on some TPU "
                    "runtimes; set TORCHSR_FORCE_PROFILE=1 to force a "
                    "device trace)"
                )
            self._timing = True
            self._stamps = [(time.perf_counter(), 0)]
            self._trace_started_at = self._seen
            return
        jax.profiler.start_trace(self.out_dir)
        self._tracing = True
        self._trace_started_at = self._seen

    def step(self, k: int = 1) -> None:
        """Call once per jitted call (after dispatching it), with the
        number of train steps the call fused (multi-step programs pass
        their K; cadence deltas are divided by it)."""
        if self._done:
            return
        self._seen += k
        if not (self._tracing or self._timing):
            if self._seen > self.START_AT_STEP:
                self._start()
            return
        if self._timing:
            self._stamps.append((time.perf_counter(), k))
        if self._seen - self._trace_started_at >= self.num_steps:
            self.stop()

    def stop(self) -> None:
        if self._tracing:
            import jax

            jax.block_until_ready(
                jax.device_put(0)
            )  # flush outstanding work into the trace
            jax.profiler.stop_trace()
            self._tracing = False
            if self.logger is not None:
                self.logger.log(
                    f"Wrote {self.num_steps}-step profiler trace to "
                    f"{self.out_dir}/"
                )
        elif self._timing and len(self._stamps) >= 2:
            # One stamp per jitted call; per-step time is the call
            # delta divided by that call's fused step count.
            deltas = sorted(
                (t1 - t0) / max(k1, 1)
                for (t0, _), (t1, k1) in zip(
                    self._stamps, self._stamps[1:]
                )
            )
            n = len(deltas)
            mean = sum(deltas) / n
            summary = {
                "steps_timed": sum(k1 for _, k1 in self._stamps[1:]),
                "calls_timed": n,
                "mean_ms": round(mean * 1e3, 3),
                "p50_ms": round(deltas[n // 2] * 1e3, 3),
                "p90_ms": round(deltas[(9 * n) // 10] * 1e3, 3),
                "max_ms": round(deltas[-1] * 1e3, 3),
                "steps_per_sec": round(1.0 / max(mean, 1e-9), 3),
                "note": (
                    "host-side per-call cadence divided by each "
                    "call's fused step count (TPU trace fallback); "
                    "tracks device step time only when the loop "
                    "consumes per-call results — i.e. when wandb "
                    "logging is active; otherwise dispatch is async "
                    "and the cadence can read below real device step "
                    "time.  For device-side section anatomy use "
                    "tools/profile_gan_step.py"
                ),
            }
            os.makedirs(self.out_dir, exist_ok=True)
            path = os.path.join(self.out_dir, "step_times.json")
            with open(path, "w") as fh:
                json.dump(summary, fh, indent=2)
            if self.logger is not None:
                self.logger.log(
                    f"Step-cadence summary ({n} steps): "
                    f"mean {summary['mean_ms']} ms, "
                    f"p90 {summary['p90_ms']} ms -> {path}"
                )
            self._timing = False
        self._done = True
