"""Optional step profiling via jax.profiler.

The reference's only performance instrumentation is wall-clock epoch
throughput (srgan/trainer.py:374, :401-403); SURVEY.md section 5 calls
for keeping that metric and adding an optional ``jax.profiler.trace``
window.  ``StepProfiler`` captures a TensorBoard-compatible device trace
of N hot-loop steps (skipping the compile step), written to
``--profile-dir``.
"""

from __future__ import annotations


class StepProfiler:
    """Trace a window of train steps, once per run."""

    # Skip the first steps: they include compilation and warm-up.
    START_AT_STEP = 2

    def __init__(self, num_steps: int, out_dir: str, logger=None) -> None:
        self.num_steps = num_steps or 0
        self.out_dir = out_dir or "traces"
        self.logger = logger
        self._seen = 0
        self._tracing = False
        self._done = self.num_steps <= 0

    def step(self) -> None:
        """Call once per train step (after dispatching the step)."""
        if self._done:
            return
        self._seen += 1
        if not self._tracing and self._seen > self.START_AT_STEP:
            import os

            import jax

            if (
                jax.default_backend() not in ("cpu", "gpu")
                and os.environ.get("TORCHSR_FORCE_PROFILE") != "1"
            ):
                # Some TPU runtimes (including this repo's dev platform)
                # hang inside start_trace; requiring an explicit opt-in
                # keeps --profile-steps from wedging a real training run.
                if self.logger is not None:
                    self.logger.log(
                        "Skipping profiler trace on TPU backend (set "
                        "TORCHSR_FORCE_PROFILE=1 to force; some TPU "
                        "runtimes hang in jax.profiler.start_trace)"
                    )
                self._done = True
                return
            jax.profiler.start_trace(self.out_dir)
            self._tracing = True
            self._trace_started_at = self._seen
        elif self._tracing and (
            self._seen - self._trace_started_at + 1 >= self.num_steps
        ):
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
        self._done = True
