"""Multi-head linear attention — content-gated sequence scaling.

Reference model/PMMA/encoder.py:88-140: per position, an MLP
(lin1 d_model→d_diff, act, lin2 →nhead) produces nhead scalars, softmaxed over
the *sequence* axis; the gate tensor (B, nhead, L) then scales v after a raw
row-major ``view(B*H, L, head_dim)`` reshape.

NOTE: that torch ``view`` does NOT split the feature axis into heads — it
reinterprets the contiguous (L, E) buffer, so gate element (h, l) scales
original position ``h*L/H + l//H`` feature block ``l % H`` (for the shapes
used here).  jnp.reshape has identical row-major semantics, so reproducing
the computation exactly is a plain reshape — no special handling needed.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.nn.layers import TorchDense


class MultiHeadLinearAttention(nn.Module):
    d_model: int
    nhead: int = 8
    d_diff: int = 32
    dropout: float = 0.1
    activation: str = "tanh"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, v, train: bool = False):
        act = {"tanh": jnp.tanh, "relu": nn.relu,
               "gelu": lambda x: jax.nn.gelu(x, approximate=False)}[self.activation]
        attn = act(TorchDense(self.d_diff, dtype=self.dtype, name="lin1")(v))
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        attn = TorchDense(self.nhead, dtype=self.dtype, name="lin2")(attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1).astype(v.dtype)  # softmax over sequence (fp32)
        attn = attn.transpose(0, 2, 1)               # (B, H, L)

        B, L, E = v.shape
        H = self.nhead
        head_dim = E // H
        gated = attn.reshape(B * H, L, 1) * v.reshape(B * H, L, head_dim)
        return gated.reshape(B, L, E)
