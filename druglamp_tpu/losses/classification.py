"""Classification losses (reference model/basic_model.py:17-34)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def binary_cross_entropy(pred_logits: jnp.ndarray, labels: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sigmoid + BCE (mean).  Returns (probabilities, loss).

    pred_logits: (B, 1) raw scores; labels: (B,) in {0,1}.
    Computed in the numerically stable logits form (equivalent to the
    reference's Sigmoid→BCELoss composition up to fp error).
    """
    logits = jnp.squeeze(pred_logits, axis=-1).astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    loss = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return probs, loss.mean()


def cross_entropy_logits(linear_output: jnp.ndarray, labels: jnp.ndarray,
                         weights: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax CE over 2 classes; returns (P(class 1), loss)."""
    logp = jax.nn.log_softmax(linear_output.astype(jnp.float32), axis=1)
    n = jnp.exp(logp)[:, 1]
    labels = labels.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if weights is None:
        loss = nll.mean()
    else:
        loss = jnp.sum(weights * nll) / jnp.sum(weights)
    return n, loss
