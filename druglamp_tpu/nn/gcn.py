"""Molecular GCN over dense padded graphs.

The reference runs dgllife's GCN (sparse DGL message passing with symmetric
degree normalization, residual Linear+ReLU, BatchNorm per layer; reference
model/basic_model.py:137-153,217-436 and GraphConv :438-638).  Graphs are
padded host-side to a fixed 512 nodes, so on TPU the natural formulation is
dense: one batched matmul per layer with the normalized adjacency

    Â = D^(-1/2) · A_eff · D^(-1/2),   A_eff = bonds + 2I(real) + 1I(virtual)

(the 2/1 self-loop multiplicity reproduces the reference's double
``add_self_loop``, handler/dataset.py:213-222).  At N=512, C=128 the Â·X
product is a single MXU-friendly (B,512,512)×(B,512,128) contraction — far
faster than gather/scatter message passing on TPU.

Layer semantics match GraphConv with norm='both', in_feats == out_feats
(aggregate → W → bias → ReLU), plus the GCNLayer residual ReLU(Linear(x)) and
BatchNorm1d over flattened nodes (basic_model.py:411-436).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.nn import inits
from druglamp_tpu.nn.layers import TorchBatchNorm, TorchDense


def _init_transform_kernel(key, shape, dtype=jnp.float32):
    """torch Linear init with the LAST OUTPUT unit zeroed.

    The reference zeroes ``init_transform.weight[-1]`` — the last *output*
    channel's weights — when padding is enabled (basic_model.py:140-143).
    flax kernels are (in, out), so that is the last column.
    """
    k = inits.torch_linear_kernel(key, shape, dtype)
    return k.at[:, -1].set(0.0)


class GCNLayer(nn.Module):
    out_feats: int
    dtype: Optional[jnp.dtype] = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, adj_norm, train: bool = False):
        # x: (B, N, C); adj_norm: (B, N, N) pre-normalized Â, or the packed
        # form {"packed", "nrm", "n2r"} for the fused Pallas kernel
        # (kernels/gcn_pallas.py) — Â then never materializes in HBM.
        cdtype = self.dtype or x.dtype
        if isinstance(adj_norm, dict):
            from druglamp_tpu.kernels.gcn_pallas import gcn_packed_matmul

            agg = gcn_packed_matmul(adj_norm["packed"], adj_norm["nrm"],
                                    adj_norm["n2r"], x.astype(cdtype)
                                    ).astype(jnp.float32)
        else:
            agg = jax.lax.dot_general(
                adj_norm.astype(cdtype), x.astype(cdtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        w = self.param("graph_kernel", inits.xavier_uniform, (x.shape[-1], self.out_feats))
        b = self.param("graph_bias", inits.zeros, (self.out_feats,))
        h = jnp.dot(agg.astype(cdtype), w.astype(cdtype),
                    preferred_element_type=jnp.float32) + b
        h = nn.relu(h)
        res = nn.relu(TorchDense(self.out_feats, name="res_connection")(x))
        h = h + res
        # BatchNorm1d over flattened nodes (stats include virtual nodes,
        # matching the reference).
        B, N, C = h.shape
        h = TorchBatchNorm(name="bn", groups=self.bn_groups)(
            h.reshape(B * N, C), use_running_average=not train)
        return h.reshape(B, N, C).astype(x.dtype)


class MolecularGCN(nn.Module):
    in_feats: int = 75
    dim_embedding: int = 128
    hidden_feats: Sequence[int] = (128, 128, 128)
    padding: bool = True
    dtype: Optional[jnp.dtype] = None
    bn_groups: int = 1

    @nn.compact
    def __call__(self, node_feats, adj, degrees, train: bool = False):
        """node_feats (B,N,75) f32, adj (B,N,N) uint8 — or, on the packed
        path, {"packed" (B,N,N/8) u8, "real" (B,N) f32} — degrees (B,N) f32
        → (B,N,128)."""
        kernel_init = _init_transform_kernel if self.padding else inits.torch_linear_kernel
        w0 = self.param("init_transform", kernel_init, (self.in_feats, self.dim_embedding))
        x = jnp.dot(node_feats, w0)

        # n = deg^(-1/2); shared by all layers.
        n = jax.lax.rsqrt(jnp.maximum(degrees, 1.0))
        if isinstance(adj, dict):
            # fused Pallas path: Â never materializes (kernels/gcn_pallas.py)
            adj_norm = {"packed": adj["packed"], "nrm": n,
                        "n2r": n * n * adj["real"]}
        else:
            # Â = n nᵀ ⊙ A; built once, shared by all layers.
            adj_norm = (n[:, :, None] * adj.astype(jnp.float32)) * n[:, None, :]
            adj_norm = adj_norm.astype(self.dtype or x.dtype)

        for i, feats in enumerate(self.hidden_feats):
            x = GCNLayer(feats, dtype=self.dtype, bn_groups=self.bn_groups,
                         name=f"layer_{i}")(x, adj_norm, train=train)
        return x
