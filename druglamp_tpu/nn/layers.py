"""Shared primitive layers with torch-matching defaults."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.nn import inits


class TorchDense(nn.Module):
    """Dense with torch.nn.Linear default init (kaiming_uniform a=√5)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", inits.torch_linear_kernel, (in_features, self.features))
        y = jnp.dot(x.astype(self.dtype or x.dtype), kernel.astype(self.dtype or kernel.dtype))
        if self.use_bias:
            bias = self.param("bias", inits.torch_linear_bias(in_features), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over (N, C) where only ``mask``-selected rows contribute stats.

    Used by the cross-modality head: the reference applies BatchNorm to the
    *unique-entity* rows only (cross_modality.py:152-162 indexes before the
    Mean2Embed BN), while our jitted formulation keeps a fixed batch shape and
    masks invalid rows out of the statistics.  Running stats follow torch
    conventions (momentum 0.1, unbiased running var).
    """

    affine: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=0) / n
            var = (((x - mean) ** 2) * m).sum(axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            y = y * scale + bias
        return y


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch conventions: eps 1e-5, running-stat momentum 0.1.

    flax momentum semantics: ra = momentum*ra + (1-momentum)*batch,
    so flax momentum 0.9 == torch momentum 0.1.  Normalizes over all axes
    except the last (feature) axis — callers reshape so that the torch
    BatchNorm1d reduction axes map to the leading axes.
    """

    affine: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        ura = use_running_average
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=self.affine,
            use_scale=self.affine,
            dtype=self.dtype,
        )(x)
