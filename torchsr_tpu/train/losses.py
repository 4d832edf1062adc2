"""Loss functions matching the reference's torch loss semantics.

The reference wires (SURVEY.md section 2 #13/#17):
  * SRGAN pretrain:  MSE(sr, hr)                       (srgan/trainer.py:384)
  * SRGAN disc:      BCE(D(hr),1) + BCE(D(sr'),0)      (:446-448)
  * SRGAN gen:       VGG_L1 + 0.001 * BCE(D(sr),1)     (:455-457)
  * ESRGAN pretrain: L1(sr, hr)                        (esrgan/trainer.py:386)
  * ESRGAN disc:     relativistic-average BCEwL / 2    (:446-453)
  * ESRGAN gen:      0.01*L1 + VGG_L1 + 0.005*BCEwL    (:461-469)

All reductions are means, computed in float32.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(jnp.square(pred - target))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(jnp.abs(pred - target))


def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy on probabilities.

    Matches ``torch.nn.BCELoss``: log terms are clamped at -100 so a
    saturated discriminator yields a large-but-finite loss instead of inf.
    """
    probs = probs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(probs), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_1mp)


def bce_with_logits_loss(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    """Numerically stable BCE on logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*t + log(1 + exp(-|x|))
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(loss)
