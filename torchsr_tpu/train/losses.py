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

    torch's BCELoss clamps the log terms at -100 and bounds the
    backward; in JAX a ``maximum(log(p), -100)`` formulation is a NaN
    trap — at ``p == 0`` the pullback evaluates ``0 * inf``.  A
    saturated discriminator reaches exactly p in {0, 1} within a few
    dozen GAN steps, so probabilities are clipped *before* the log
    (eps 1e-7, the float32 resolution around 1): the loss caps at ~16
    instead of torch's 100 and gradients stay finite (<=1e7), which is
    the behavior torch's bounded backward provides.
    """
    probs = probs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    eps = 1e-7
    probs = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(
        targets * jnp.log(probs)
        + (1.0 - targets) * jnp.log1p(-probs)
    )


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
