"""Observability: main-process logging, optional WandB, JSONL, tqdm.

Preserves the reference's metric-key contract exactly (SURVEY.md
section 5): ``psnr/train-loss``, ``psnr/epoch``,
``psnr/throughput/train``, ``{psnr|gan}/PSNR``, ``{..}/val-loss``,
``{..}/throughput/test``, ``{..}/epoch``, ``gan/disc-lr``,
``gan/gen-lr``, ``gan/train-loss``, ``gan/throughput/train``,
``images/epoch{N}`` — plus new ``{..}/SSIM`` keys (SSIM is additive
capability over the reference).

Sinks: WandB when the package is importable (the reference's only
sink, torchsr.py:18-21 — optional there too), and/or a local JSONL
file via ``train --metrics-file`` (additive: TPU fleets rarely have a
WandB egress; the same metric keys land one dict per line with a
``step`` field, so curves are greppable/plottable offline).
"""

from __future__ import annotations

import json

try:
    import wandb
except ImportError:  # wandb is optional, like the reference (torchsr.py:18-21)
    wandb = None


class Logger:
    """Main-process-gated print + WandB/JSONL metric logging."""

    def __init__(
        self, main_process: bool, config=None,
        metrics_path: str | None = None,
    ) -> None:
        self.main_process = main_process
        self._wandb_run = None
        self._metrics_fh = None
        if wandb and main_process:
            self._wandb_run = wandb.init(
                config=config, name="TorchSR", project="torchsr"
            )
        if metrics_path and main_process:
            self._metrics_fh = open(metrics_path, "a", buffering=1)
            if config is not None:
                self._metrics_fh.write(json.dumps(
                    {"config": {
                        k: v for k, v in dict(config).items()
                        if isinstance(v, (int, float, str, bool, type(None)))
                    }}
                ) + "\n")

    @property
    def wandb_active(self) -> bool:
        """True when per-step metric values will actually be consumed —
        lets hot loops skip host syncs (float() on device scalars) when
        nothing is listening."""
        return bool(
            (wandb or self._metrics_fh is not None) and self.main_process
        )

    def log(self, statement: str) -> None:
        """Print only on the main process (reference srgan/trainer.py:207-217)."""
        if self.main_process:
            print(statement, flush=True)

    def log_wandb(self, contents: dict, step: int | None = None) -> None:
        if not self.main_process:
            return
        if wandb:
            wandb.log(contents, step=step)
        if self._metrics_fh is not None:
            self._metrics_fh.write(
                json.dumps({"step": step, **contents}) + "\n"
            )

    def log_image(self, key: str, image) -> None:
        if wandb and self.main_process:
            wandb.log({key: wandb.Image(image)})

    def finish(self) -> None:
        if wandb and self._wandb_run is not None:
            wandb.finish()
        if self._metrics_fh is not None:
            self._metrics_fh.close()
            self._metrics_fh = None
