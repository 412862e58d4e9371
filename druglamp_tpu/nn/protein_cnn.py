"""Protein CNN encoder (reference model/basic_model.py:155-180).

Embedding(27 → embedding_dim-1, pad id 0 pinned to zeros) ‖ fill-bit, then
3 × [Conv1d 'same' → ReLU → BatchNorm].  Layout is (B, L, C) throughout
(TPU-friendly NWC); torch's asymmetric 'same' padding for even kernels
(left = (k-1)//2, right = k//2) is reproduced so kernel size 6 matches.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.nn import inits
from druglamp_tpu.nn.layers import TorchBatchNorm


class ProteinCNN(nn.Module):
    embedding_dim: int = 128
    num_filters: Sequence[int] = (128, 128, 128)
    kernel_size: Sequence[int] = (3, 6, 9)
    padding: bool = True
    vocab: int = 27
    dtype: Optional[jnp.dtype] = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, v, fill_mask, train: bool = False):
        """v (B, L) int tokens, fill_mask (B, L) float → (B, L, num_filters[-1])."""
        emb_table = self.param("embedding", inits.normal_embed,
                               (self.vocab, self.embedding_dim - 1))
        if os.environ.get("DRUGLAMP_ONEHOT_EMBED", "1") == "1":
            # The xprof per-fusion profile (docs/artifacts/xprof_cls_r5.log)
            # shows this gather's BACKWARD — a scatter-add of (B·L) rows
            # into the (27, 127) table — as the largest single op of the
            # cls step (274 µs, 3.1%).  As a one-hot matmul both directions
            # are MXU matmuls: fwd (B·L,27)@(27,127); bwd for the table is
            # onehotᵀ@g, a dense reduction.  Values are exact (each output
            # element is a single product).  On-chip A/B: 1876 vs 1790
            # pairs/s cls step (+4.7%, bench_onehot_ab_r5.log) — default on;
            # DRUGLAMP_ONEHOT_EMBED=0 restores the gather.
            oh = jax.nn.one_hot(v, self.vocab, dtype=emb_table.dtype)
            x = oh @ emb_table
        else:
            x = emb_table[v]
        if self.padding:
            # torch padding_idx=0: row 0 is zeros and never trains
            x = x * (v != 0)[..., None].astype(x.dtype)
        x = jnp.concatenate([x, fill_mask[..., None].astype(x.dtype)], axis=-1)

        cdtype = self.dtype or x.dtype
        x = x.astype(cdtype)
        for i, (filters, k) in enumerate(zip(self.num_filters, self.kernel_size)):
            total = k - 1
            pad = (total // 2, total - total // 2)
            in_ch = x.shape[-1]
            x = nn.Conv(
                features=filters,
                kernel_size=(k,),
                padding=(pad,),
                kernel_init=inits.torch_conv_kernel,
                bias_init=inits.torch_conv_bias(in_ch * k),
                dtype=cdtype,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
            x = TorchBatchNorm(name=f"bn{i + 1}", groups=self.bn_groups)(
                x.astype(jnp.float32), use_running_average=not train
            ).astype(cdtype)
        return x
