"""Normalization layers.

GainLayerNorm reproduces the reference's custom parameter-only LayerNorm
(reference model/basic_model.py:37-46): gain only (no bias), biased variance,
eps 1e-5 for float32 inputs / 1e-3 for half-precision inputs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GainLayerNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * g).astype(x.dtype)
