"""Focal loss (reference model/PMMA/paired_multi_model_attention_model.py:32-76
``FocalLossV1`` — present in the reference but unused by its training path;
provided for capability parity)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, alpha: float = 0.25,
               gamma: float = 2.0, reduction: str = "mean") -> jnp.ndarray:
    """Binary focal loss over raw logits (numerically stable log-probs)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    coeff = -jnp.abs(labels - probs) ** gamma
    log_p = -jnp.maximum(-logits, 0.0) - jnp.log1p(jnp.exp(-jnp.abs(logits)))
    log_1p = -jnp.maximum(logits, 0.0) - jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = (labels * alpha * log_p + (1.0 - labels) * (1.0 - alpha) * log_1p) * coeff
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss
