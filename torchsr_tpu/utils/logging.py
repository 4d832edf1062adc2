"""Observability: main-process logging, optional WandB, tqdm.

Preserves the reference's metric-key contract exactly (SURVEY.md
section 5): ``psnr/train-loss``, ``psnr/epoch``,
``psnr/throughput/train``, ``{psnr|gan}/PSNR``, ``{..}/val-loss``,
``{..}/throughput/test``, ``{..}/epoch``, ``gan/disc-lr``,
``gan/gen-lr``, ``gan/train-loss``, ``gan/throughput/train``,
``images/epoch{N}`` — plus new ``{..}/SSIM`` keys (SSIM is additive
capability over the reference).
"""

from __future__ import annotations

try:
    import wandb
except ImportError:  # wandb is optional, like the reference (torchsr.py:18-21)
    wandb = None


class Logger:
    """Main-process-gated print + WandB logging."""

    def __init__(self, main_process: bool, config=None) -> None:
        self.main_process = main_process
        self._wandb_run = None
        if wandb and main_process:
            self._wandb_run = wandb.init(
                config=config, name="TorchSR", project="torchsr"
            )

    @property
    def wandb_active(self) -> bool:
        """True when per-step metric values will actually be consumed —
        lets hot loops skip host syncs (float() on device scalars) when
        nothing is listening."""
        return bool(wandb and self.main_process)

    def log(self, statement: str) -> None:
        """Print only on the main process (reference srgan/trainer.py:207-217)."""
        if self.main_process:
            print(statement, flush=True)

    def log_wandb(self, contents: dict, step: int | None = None) -> None:
        if wandb and self.main_process:
            wandb.log(contents, step=step)

    def log_image(self, key: str, image) -> None:
        if wandb and self.main_process:
            wandb.log({key: wandb.Image(image)})

    def finish(self) -> None:
        if wandb and self._wandb_run is not None:
            wandb.finish()
