"""Initializers matching the torch defaults the reference trains with.

torch.nn.Linear / Conv1d default: kaiming_uniform(a=√5) on the weight
→ U(-1/√fan_in, 1/√fan_in); bias U(-1/√fan_in, 1/√fan_in).
These distributions shape early training dynamics, so we reproduce them
rather than use flax's lecun_normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """flax Dense kernel is (in, out); torch bound is 1/sqrt(fan_in)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_kernel(key, shape, dtype=jnp.float32):
    """flax Conv kernel is (kernel_w, in_ch, out_ch); fan_in = kw * in_ch."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias(fan_in: int):
    return torch_linear_bias(fan_in)


def xavier_uniform(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.xavier_uniform()(key, shape, dtype)


def normal_embed(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, shape, dtype)


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def tiny_normal(std: float = 1e-6):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init
