"""Attention cores for PMMA (paired two-stream) and plain self-attention.

XLA fallback here; the fused Pallas TPU kernels live in
kernels/paired_attention_pallas.py and are dispatched automatically on TPU
(both attention products share one K/V load; probabilities never round-trip
to HBM).  Semantics match reference model/PMMA/attention.py:44-127:
scores scaled by 1/√head_dim, softmax over keys, no attention dropout
(config.transformer.attention_dropout_rate = 0).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from druglamp_tpu.kernels.dispatch import get_backend


def _attn(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum("bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d))
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhls,bhsd->bhld", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out, p


def paired_attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_other: jnp.ndarray,
    need_weights: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Self- and guided-attention against shared K/V.

    All inputs (B, H, L, D).  Returns (self_out, guided_out, self_probs,
    guided_probs); probs are None unless need_weights.
    """
    # pallas wins only at bf16 (fp32-on-MXU XLA is already near-roofline at
    # these shapes; measured in tools/kernel_check.py)
    if get_backend() == "pallas" and not need_weights and q.dtype == jnp.bfloat16:
        from druglamp_tpu.kernels.paired_attention_pallas import paired_attention_pallas

        self_out, guided_out = paired_attention_pallas(q, k, v, q_other)
        return self_out, guided_out, None, None
    self_out, p1 = _attn(q, k, v)
    guided_out, p2 = _attn(q_other, k, v)
    if not need_weights:
        p1 = p2 = None
    return self_out, guided_out, p1, p2


def self_attention_core(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, need_weights: bool = False
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    if get_backend() == "pallas" and not need_weights and q.dtype == jnp.bfloat16:
        from druglamp_tpu.kernels.paired_attention_pallas import self_attention_pallas

        return self_attention_pallas(q, k, v), None
    out, p = _attn(q, k, v)
    return out, (p if need_weights else None)
