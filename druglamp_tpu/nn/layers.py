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

    ``groups > 1``: per-replica stats over contiguous leading-axis blocks
    (torch-DDP emulation, cf. TorchBatchNorm.groups); running stats follow
    block 0 (the rank-0 checkpoint).
    """

    affine: bool = True
    epsilon: float = 1e-5
    groups: int = 1

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        C = x.shape[-1]
        g = self.groups
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        elif g <= 1:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=0) / n
            var = (((x - mean) ** 2) * m).sum(axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
            y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        else:
            B = x.shape[0]
            if B % g:
                raise ValueError(f"leading dim {B} not divisible by groups {g}")
            xg = x.reshape(g, B // g, C)
            mg = mask.astype(jnp.float32).reshape(g, B // g, 1)
            n = jnp.maximum(mg.sum(axis=1), 1.0)                 # (g, 1)
            mean = (xg * mg).sum(axis=1) / n                     # (g, C)
            var = (((xg - mean[:, None]) ** 2) * mg).sum(axis=1) / n
            if not self.is_initializing():
                unbiased = var[0] * n[0] / jnp.maximum(n[0] - 1.0, 1.0)
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean[0]
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
            y = ((xg - mean[:, None]) * jax.lax.rsqrt(var[:, None] + self.epsilon)
                 ).reshape(B, C)
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

    ``groups > 1`` selects per-replica statistics (torch-DDP emulation for
    DP training, reference trainer.py:147 — DDP never syncs BN): the leading
    axis is split into ``groups`` contiguous blocks (block boundaries align
    with the mesh 'data' shard boundaries, so XLA computes each block's
    stats shard-locally with no collectives), each block is normalized by
    its own batch statistics, and the running stats are updated from block
    0 only — matching the rank-0 module torch saves in its checkpoint.
    """

    affine: bool = True
    dtype: Optional[jnp.dtype] = None
    groups: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        if self.groups <= 1:
            return nn.BatchNorm(
                use_running_average=use_running_average,
                momentum=0.9,
                epsilon=1e-5,
                use_bias=self.affine,
                use_scale=self.affine,
                dtype=self.dtype,
            )(x)
        # name matches nn.BatchNorm's auto-name so checkpoints trained in
        # either mode load into the other
        return _GroupedBatchNorm(groups=self.groups, affine=self.affine,
                                 dtype=self.dtype, name="BatchNorm_0")(
            x, use_running_average)


class _GroupedBatchNorm(nn.Module):
    """BatchNorm with per-group batch statistics along contiguous blocks of
    the leading axis (torch-DDP per-replica BN semantics; see TorchBatchNorm).

    Running stats use torch's exact update (momentum 0.1, *unbiased* batch
    variance) from group 0 only.  Param/stat names mirror flax nn.BatchNorm
    ({scale, bias} / {mean, var}) for checkpoint compatibility.
    """

    groups: int
    affine: bool = True
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        xf = x.astype(jnp.float32)
        if use_running_average:
            y = (xf - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.epsilon)
        else:
            g = self.groups
            B0 = x.shape[0]
            if B0 % g:
                raise ValueError(
                    f"leading dim {B0} not divisible by bn groups {g}")
            xg = xf.reshape((g, B0 // g) + x.shape[1:])
            axes = tuple(range(1, xg.ndim - 1))
            mean_g = xg.mean(axis=axes)                        # (g, C)
            var_g = ((xg - jnp.expand_dims(mean_g, axes)) ** 2).mean(axis=axes)
            yg = (xg - jnp.expand_dims(mean_g, axes)) * jax.lax.rsqrt(
                jnp.expand_dims(var_g, axes) + self.epsilon)
            y = yg.reshape(xf.shape)
            if not self.is_initializing():
                n = jnp.float32(xf.size // (g * C))   # rows per group
                unbiased = var_g[0] * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean_g[0]
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
            y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
