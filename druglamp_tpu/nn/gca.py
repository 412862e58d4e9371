"""PGCA guided cross-attention (reference model/PGCA/guided_cross_attention_model.py).

The reference forks torch MultiheadAttention solely to also return the
*pre-softmax scaled logits* (B, H, L, S) for interpretability (:307-320).
Used with num_heads=1, query=protein tokens (L=256), key=value=drug tokens
(S=512).  This implementation is batch-first (B, L, E) — the reference's
(L, B, E) permutes at the call site (model/DrugLAMP.py:55-58) cancel out.

The packed in_proj weight is initialized with xavier_uniform over the full
(3E, E) matrix exactly as torch's _reset_parameters does (bound uses
fan = 3E + E), since that changes the init scale vs per-matrix xavier.

The raw-logits output is only produced when ``need_raw=True`` (eval/vis
path); the training path lets XLA fuse the single-head attention (at
L=256, S=512, 1 head the op is bandwidth-trivial — measured no win from a
custom kernel at these shapes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from druglamp_tpu.nn import inits
from druglamp_tpu.nn.layers import TorchDense


def _in_proj_init(embed_dim: int):
    bound = float(np.sqrt(6.0 / (3 * embed_dim + embed_dim)))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GuidedCrossAttention(nn.Module):
    embed_dim: int
    num_heads: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, key, value, need_raw: bool = True
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """query (B,L,E), key/value (B,S,E) → (out (B,L,E), raw logits (B,H,L,S))."""
        E, H = self.embed_dim, self.num_heads
        head_dim = E // H
        scaling = head_dim ** -0.5
        cdtype = self.dtype or query.dtype

        w = self.param("in_proj_weight", _in_proj_init(E), (E, 3 * E))
        b = self.param("in_proj_bias", inits.zeros, (3 * E,))
        wq, wk, wv = w[:, :E], w[:, E : 2 * E], w[:, 2 * E :]
        bq, bk, bv = b[:E], b[E : 2 * E], b[2 * E :]

        q = (jnp.dot(query.astype(cdtype), wq.astype(cdtype)) + bq) * scaling
        k = jnp.dot(key.astype(cdtype), wk.astype(cdtype)) + bk
        v = jnp.dot(value.astype(cdtype), wv.astype(cdtype)) + bv

        B, L, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, L, H, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhld,bhsd->bhls", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(cdtype)
        out = jnp.einsum("bhls,bhsd->bhld", attn, v,
                         preferred_element_type=jnp.float32).astype(cdtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)

        out = TorchDense(E, name="out_proj")(out)
        return out, (logits if need_raw else None)
