"""Numerics parity of flax modules vs independent torch implementations.

Each test builds the torch computation from the documented math (sum-over-
neighbors GCN with symmetric norm, Conv1d 'same' padding, torch
MultiheadAttention for GCA, raw row-major view() for MHLA), loads the SAME
weights from the flax params, and compares outputs elementwise.  This pins
the subtle conventions (asymmetric even-kernel padding, double self-loops,
head-reshape semantics) against an implementation we didn't write in JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from druglamp_tpu.nn.gca import GuidedCrossAttention
from druglamp_tpu.nn.gcn import MolecularGCN
from druglamp_tpu.nn.mhla import MultiHeadLinearAttention
from druglamp_tpu.nn.protein_cnn import ProteinCNN

RTOL, ATOL = 2e-4, 2e-5


def test_protein_cnn_matches_torch_conv1d():
    B, L, E = 2, 96, 16
    r = np.random.RandomState(0)
    v = r.randint(0, 27, (B, L)).astype(np.int32)
    v[:, :5] = 0
    fill = (r.rand(B, L) > 0.8).astype(np.float32)

    model = ProteinCNN(embedding_dim=E, num_filters=(E, E, E), kernel_size=(3, 6, 9))
    variables = model.init(jax.random.key(0), jnp.asarray(v), jnp.asarray(fill),
                           train=False)
    out = np.asarray(model.apply(variables, jnp.asarray(v), jnp.asarray(fill),
                                 train=True, mutable=["batch_stats"])[0])

    p = variables["params"]
    emb_t = torch.tensor(np.asarray(p["embedding"]))
    x = emb_t[torch.tensor(v.astype(np.int64))]
    x = x * torch.tensor((v != 0).astype(np.float32)).unsqueeze(-1)
    x = torch.cat([x, torch.tensor(fill).unsqueeze(-1)], dim=-1)
    x = x.transpose(2, 1)  # (B, C, L)
    for i, k in enumerate((3, 6, 9)):
        kern = np.asarray(p[f"conv{i + 1}"]["kernel"])  # (k, in, out)
        w = torch.tensor(kern.transpose(2, 1, 0))       # (out, in, k)
        b = torch.tensor(np.asarray(p[f"conv{i + 1}"]["bias"]))
        x = F.conv1d(x, w, b, padding="same")
        x = F.relu(x)
        x = F.batch_norm(x, None, None, training=True, eps=1e-5)
    ref = x.transpose(2, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=1e-4)


def test_gca_matches_torch_multihead_attention():
    B, L, S, E = 2, 12, 20, 16
    r = np.random.RandomState(1)
    q = r.randn(B, L, E).astype(np.float32)
    kv = r.randn(B, S, E).astype(np.float32)

    model = GuidedCrossAttention(embed_dim=E, num_heads=1)
    variables = model.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(kv),
                           jnp.asarray(kv))
    out, raw = model.apply(variables, jnp.asarray(q), jnp.asarray(kv),
                           jnp.asarray(kv), need_raw=True)

    mha = torch.nn.MultiheadAttention(E, 1, batch_first=False)
    p = variables["params"]
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.tensor(np.asarray(p["in_proj_weight"]).T))
        mha.in_proj_bias.copy_(torch.tensor(np.asarray(p["in_proj_bias"])))
        mha.out_proj.weight.copy_(
            torch.tensor(np.asarray(p["out_proj"]["kernel"]).T))
        mha.out_proj.bias.copy_(torch.tensor(np.asarray(p["out_proj"]["bias"])))
    with torch.no_grad():
        ref, ref_w = mha(torch.tensor(q).permute(1, 0, 2),
                         torch.tensor(kv).permute(1, 0, 2),
                         torch.tensor(kv).permute(1, 0, 2))
    np.testing.assert_allclose(np.asarray(out), ref.permute(1, 0, 2).numpy(),
                               rtol=RTOL, atol=1e-4)
    # raw logits softmax over keys == torch's averaged attention weights (1 head)
    probs = jax.nn.softmax(raw, axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(probs), ref_w.numpy(), rtol=RTOL, atol=1e-5)


def test_mhla_matches_torch_view_semantics():
    B, L, E, H, D = 2, 32, 64, 8, 512 // 8
    r = np.random.RandomState(2)
    v = r.randn(B, L, E).astype(np.float32)

    model = MultiHeadLinearAttention(d_model=E, d_diff=32, nhead=H, dropout=0.0,
                                     activation="gelu")
    variables = model.init(jax.random.key(0), jnp.asarray(v), train=False)
    out = np.asarray(model.apply(variables, jnp.asarray(v), train=False))

    p = variables["params"]
    vt = torch.tensor(v)
    a = F.gelu(vt @ torch.tensor(np.asarray(p["lin1"]["kernel"]))
               + torch.tensor(np.asarray(p["lin1"]["bias"])))
    a = a @ torch.tensor(np.asarray(p["lin2"]["kernel"])) \
        + torch.tensor(np.asarray(p["lin2"]["bias"]))
    a = F.softmax(a, dim=1).transpose(1, 2)          # (B, H, L)
    head_dim = E // H
    vv = vt.contiguous().view(B * H, L, head_dim)    # the reference's raw view
    aa = a.contiguous().view(B * H, L).unsqueeze(-1)
    ref = (aa * vv).view(B, L, E).numpy()
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=1e-5)


def test_gcn_matches_torch_scatter_message_passing():
    """Dense Â·X formulation == explicit per-edge scatter aggregation."""
    B, N, C = 2, 12, 8
    r = np.random.RandomState(3)
    feats = r.randn(B, N, 75).astype(np.float32)
    # random graph: ring + extra edges; real atoms = 8, virtual = 4
    n_real = 8
    adj = np.zeros((B, N, N), np.uint8)
    for b in range(B):
        for i in range(n_real - 1):
            adj[b, i, i + 1] = adj[b, i + 1, i] = 1
        adj[b, 0, 5] = adj[b, 5, 0] = 1
        for i in range(N):
            adj[b, i, i] = 2 if i < n_real else 1
    deg = adj.sum(-1).astype(np.float32)

    model = MolecularGCN(in_feats=75, dim_embedding=C, hidden_feats=(C,))
    variables = model.init(jax.random.key(0), jnp.asarray(feats), jnp.asarray(adj),
                           jnp.asarray(deg), train=False)
    out = np.asarray(model.apply(variables, jnp.asarray(feats), jnp.asarray(adj),
                                 jnp.asarray(deg), train=True,
                                 mutable=["batch_stats"])[0])

    p = variables["params"]
    x = torch.tensor(feats) @ torch.tensor(np.asarray(p["init_transform"]))
    layer = p["layer_0"]
    W = torch.tensor(np.asarray(layer["graph_kernel"]))
    bias = torch.tensor(np.asarray(layer["graph_bias"]))
    res_w = torch.tensor(np.asarray(layer["res_connection"]["kernel"]))
    res_b = torch.tensor(np.asarray(layer["res_connection"]["bias"]))

    outs = []
    for b in range(B):
        n = torch.tensor(deg[b]) ** -0.5
        agg = torch.zeros(N, C)
        # explicit edge-wise message passing with multiplicity
        for i in range(N):
            for j in range(N):
                m = int(adj[b, i, j])
                if m:
                    agg[i] += m * n[i] * n[j] * x[b, j]
        h = F.relu(agg @ W + bias) + F.relu(x[b] @ res_w + res_b)
        outs.append(h)
    h = torch.stack(outs).view(B * N, C)
    h = F.batch_norm(h, None, None, training=True, eps=1e-5).view(B, N, C)
    np.testing.assert_allclose(out, h.numpy(), rtol=1e-3, atol=1e-4)


def test_gain_layernorm_matches_reference_formula():
    """Gain-only LN: biased variance, eps by dtype (basic_model.py:37-46)."""
    from druglamp_tpu.nn.norms import GainLayerNorm

    x = np.random.RandomState(0).randn(4, 10, 16).astype(np.float32)
    m = GainLayerNorm(dim=16)
    v = m.init(jax.random.key(0), jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))
    xt = torch.tensor(x)
    var = xt.var(dim=-1, unbiased=False, keepdim=True)
    mean = xt.mean(dim=-1, keepdim=True)
    ref = ((xt - mean) * (var + 1e-5).rsqrt()).numpy()  # g init = ones
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
