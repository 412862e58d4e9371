"""MLP heads and adaptors (reference model/basic_model.py:182-215)."""

from __future__ import annotations

import flax.linen as nn
import jax

from druglamp_tpu.nn.layers import TorchBatchNorm, TorchDense


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class FeedForwardLayer(nn.Module):
    """lin1(d_in→d_h) → GELU → LayerNorm(d_h) → lin2(d_h→d_in)."""

    d_h: int

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        x = _gelu(TorchDense(self.d_h, name="lin1")(x))
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return TorchDense(d_in, name="lin2")(x)


class MLPClassifier(nn.Module):
    """512→1024→1024→256→1 with GELU + BatchNorm1d per hidden layer."""

    in_dim: int = 512
    hidden_dim: int = 1024
    out_dim: int = 256
    binary: int = 1
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchBatchNorm(name="bn1", groups=self.bn_groups)(
            _gelu(TorchDense(self.hidden_dim, name="fc1")(x)),
            use_running_average=not train)
        x = TorchBatchNorm(name="bn2", groups=self.bn_groups)(
            _gelu(TorchDense(self.hidden_dim, name="fc2")(x)),
            use_running_average=not train)
        x = TorchBatchNorm(name="bn3", groups=self.bn_groups)(
            _gelu(TorchDense(self.out_dim, name="fc3")(x)),
            use_running_average=not train)
        return TorchDense(self.binary, name="fc4")(x)
