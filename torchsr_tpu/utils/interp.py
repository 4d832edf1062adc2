"""Network interpolation: blend PSNR-oriented and GAN-oriented generators.

The ESRGAN paper (Wang et al. 2018, section 3.4 "Network Interpolation")
shows that linearly interpolating ALL parameters of the PSNR-pretrained
generator and the GAN-finetuned generator,

    theta_interp = (1 - alpha) * theta_PSNR + alpha * theta_GAN,

yields a continuous perception/distortion tradeoff without retraining —
alpha=0 is the sharp-metrics PSNR model, alpha=1 the perceptually-sharp
GAN model, and intermediate alphas remove GAN artifacts while keeping
most of the perceptual gain (the official ESRGAN repo ships this as
``net_interp.py`` with alpha=0.8 as the recommended default).

The reference (roclark/torchsr) trains exactly the two checkpoints this
needs — ``{model}-psnr-best`` and ``{model}-gan-best`` (reference
srgan/trainer.py:321-327) — but provides no interpolation tool; this is
a capability addition, exposed as ``torchsr interp``.

For SRGAN the generator carries BatchNorm running statistics; those are
interpolated with the same alpha (statistics are means/variances of
activations, and the blended network's activations lie between the two
endpoints' — the standard treatment, and exact at alpha in {0, 1}).
"""

from __future__ import annotations

import jax
import numpy as np

from torchsr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def interpolate_states(psnr_state, gan_state, alpha: float):
    """Leafwise ``(1-alpha)*psnr + alpha*gan`` over two generator states.

    Both states must have the identical pytree structure (same model
    architecture); a mismatch raises ``ValueError`` naming the problem
    rather than producing a silently wrong blend.
    """
    ps = jax.tree.structure(psnr_state)
    gs = jax.tree.structure(gan_state)
    if ps != gs:
        raise ValueError(
            "checkpoint parameter trees differ — both checkpoints must "
            f"come from the same model architecture (got {ps} vs {gs})"
        )
    a = float(alpha)

    def blend(p, g):
        p = np.asarray(p)
        g = np.asarray(g)
        if p.shape != g.shape:
            raise ValueError(
                "parameter shape mismatch between checkpoints: "
                f"{p.shape} vs {g.shape}"
            )
        out = (1.0 - a) * p.astype(np.float32) + a * g.astype(np.float32)
        return out.astype(p.dtype)

    return jax.tree.map(blend, psnr_state, gan_state)


def interpolate_checkpoints(
    psnr_path: str,
    gan_path: str,
    alpha: float,
    output: str,
    model: str | None = None,
) -> str:
    """Load two checkpoints (``.ckpt`` or reference ``.pth``), blend the
    generator states, and write a standard checkpoint loadable by
    ``torchsr test`` / ``torchsr export``.

    Returns the output path.  The result's phase is ``"interp"`` and its
    epoch the max of the two inputs (metadata only).
    """
    psnr_ckpt = load_checkpoint(psnr_path, model)
    if psnr_ckpt is None:
        raise FileNotFoundError(f"checkpoint not found: {psnr_path}")
    gan_ckpt = load_checkpoint(gan_path, model)
    if gan_ckpt is None:
        raise FileNotFoundError(f"checkpoint not found: {gan_path}")

    blended = interpolate_states(
        psnr_ckpt["state"], gan_ckpt["state"], alpha
    )
    epoch = max(
        int(psnr_ckpt.get("epoch", 1)), int(gan_ckpt.get("epoch", 1))
    )
    save_checkpoint(output, epoch, "interp", blended)
    return output
