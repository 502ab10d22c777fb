"""Classifier losses — exact parity with the reference formulations.

  * FocalLoss(alpha=1, gamma=2) over BCE-with-logits
    (`/root/reference/utils/trainClass.py:46-66`)
  * LabelSmoothingCrossEntropy(eps=0.1) — note the reference's (unusual)
    formulation applies softmax FIRST and takes -log of probabilities
    (`/root/reference/utils/trainClass.py:162-185`); we reproduce it
    verbatim rather than the textbook log-softmax version.
  * combined: smooth/6 + 5*focal/6 (`:362-370`)

All take one-hot float targets like the reference dataloader emits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(logits: jnp.ndarray, targets_onehot: jnp.ndarray,
               alpha: float = 1.0, gamma: float = 2.0) -> jnp.ndarray:
    """Mean focal loss over all (batch, class) elements."""
    # bce = max(x,0) - x*y + log(1+exp(-|x|))  (stable BCE-with-logits)
    x, y = logits, targets_onehot
    bce = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = jnp.exp(-bce)
    return jnp.mean(alpha * (1 - p_t) ** gamma * bce)


def label_smoothing_ce(logits: jnp.ndarray, targets_onehot: jnp.ndarray,
                       smoothing: float = 0.1) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=1)
    target_idx = jnp.argmax(targets_onehot, axis=1)
    cross = -jnp.log(jnp.take_along_axis(
        probs, target_idx[:, None], axis=1))[:, 0]
    smooth = -jnp.mean(jnp.log(probs), axis=1)
    return jnp.mean((1.0 - smoothing) * cross + smoothing * smooth)


def combined_loss(logits: jnp.ndarray, targets_onehot: jnp.ndarray) -> jnp.ndarray:
    return (label_smoothing_ce(logits, targets_onehot) / 6.0
            + focal_loss(logits, targets_onehot) * 5.0 / 6.0)
