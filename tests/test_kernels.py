"""Pallas kernel numerics vs the jnp fallback (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import druglamp_tpu.kernels.paired_attention_pallas as pk
from druglamp_tpu.kernels.paired_attention import _attn


@pytest.fixture(autouse=True)
def interpret_mode():
    pk.INTERPRET = True
    yield
    pk.INTERPRET = False


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype)


@pytest.mark.parametrize("L,S,D", [(32, 32, 16), (32, 64, 16)])
def test_paired_forward_matches_fallback(L, S, D):
    B, H = 2, 2
    q, k, v, qo = (_rand((B, H, L, D), 0), _rand((B, H, S, D), 1),
                   _rand((B, H, S, D), 2), _rand((B, H, L, D), 3))
    s_p, g_p = pk.paired_attention_pallas(q, k, v, qo)
    s_ref, _ = _attn(q, k, v)
    g_ref, _ = _attn(qo, k, v)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_paired_backward_matches_fallback():
    B, H, L, S, D = 1, 2, 32, 32, 16
    q, k, v, qo = (_rand((B, H, L, D), 0), _rand((B, H, S, D), 1),
                   _rand((B, H, S, D), 2), _rand((B, H, L, D), 3))

    def loss_pallas(q, k, v, qo):
        s, g = pk.paired_attention_pallas(q, k, v, qo)
        return (s * 1.5).sum() + (g * 0.5).sum()

    def loss_ref(q, k, v, qo):
        s, _ = _attn(q, k, v)
        g, _ = _attn(qo, k, v)
        return (s * 1.5).sum() + (g * 0.5).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, qo)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, qo)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_self_attention_kernel_matches_fallback():
    B, H, L, D = 2, 2, 32, 16
    q, k, v = _rand((B, H, L, D), 0), _rand((B, H, L, D), 1), _rand((B, H, L, D), 2)
    out = pk.self_attention_pallas(q, k, v)
    ref, _ = _attn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    g1 = jax.grad(lambda *a: pk.self_attention_pallas(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: _attn(*a)[0].sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


# --- fused packed-adjacency GCN kernel (kernels/gcn_pallas.py) --------------

def _packed_graph_case(B=2, N=512, C=64, seed=0):
    r = np.random.RandomState(seed)
    n_atoms = r.randint(N // 8, N // 2, size=B)
    adj = np.zeros((B, N, N), np.uint8)
    idx = np.arange(N)
    for b in range(B):
        na = n_atoms[b]
        for _ in range(4 * na):
            i, j = r.randint(0, na, 2)
            adj[b, i, j] = adj[b, j, i] = 1
        adj[b, idx, idx] = 1                    # universal single self-loop
    from druglamp_tpu.data.encoding import pack_adjacency

    packed = pack_adjacency(adj)
    real = (idx[None, :] < n_atoms[:, None]).astype(np.float32)
    adj_eff = adj + np.eye(N, dtype=np.uint8)[None] * real[:, :, None].astype(np.uint8)
    return packed, real, adj_eff, n_atoms


def test_gcn_packed_matmul_matches_dense(monkeypatch):
    import druglamp_tpu.kernels.gcn_pallas as gk

    monkeypatch.setattr(gk, "INTERPRET", True)
    packed, real, adj_eff, _ = _packed_graph_case()
    B, N = real.shape
    C = 64
    deg = adj_eff.sum(-1).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(gk.packed_degrees(jnp.asarray(packed), jnp.asarray(real))),
        deg)

    nrm = 1.0 / np.sqrt(np.maximum(deg, 1.0))
    x = np.random.RandomState(1).randn(B, N, C).astype(np.float32)
    ahat = nrm[:, :, None] * adj_eff * nrm[:, None, :]
    ref = np.einsum("bij,bjc->bic", ahat, x)

    f = lambda xx: gk.gcn_packed_matmul(
        jnp.asarray(packed), jnp.asarray(nrm),
        jnp.asarray(nrm * nrm * real), xx)
    y, vjp = jax.vjp(f, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)

    dy = np.random.RandomState(2).randn(B, N, C).astype(np.float32)
    # S symmetric → dx = S dy
    np.testing.assert_allclose(np.asarray(vjp(jnp.asarray(dy))[0]),
                               np.einsum("bij,bjc->bic", ahat, dy),
                               rtol=1e-5, atol=1e-5)

    np.testing.assert_array_equal(
        np.asarray(gk.unpack_dense_adj(jnp.asarray(packed), jnp.asarray(real))),
        adj_eff)


def test_decode_keep_packed_model_forward_parity(monkeypatch):
    """Full-model forward on a compact batch: packed-GCN path (interpret
    kernel) ≡ dense decode path."""
    import druglamp_tpu.kernels.gcn_pallas as gk
    from druglamp_tpu.data.encoding import compact_batch, decode_batch
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.utils.synthetic import make_batch, tiny_config

    monkeypatch.setattr(gk, "INTERPRET", True)
    monkeypatch.setattr(gk, "_ROW_TILE", 256)

    cfg = tiny_config(n_hidden=16, max_nodes=256, site_seq=16)
    batch = make_batch(cfg, 3, n_drug_feature=24, n_prot_feature=40)
    n_atoms = np.asarray((batch["d_fill"] == 0).sum(1), np.int32)
    cb = jax.tree.map(jnp.asarray, compact_batch(batch, n_atoms))

    dense = decode_batch(cb, keep_packed=False)
    packedb = decode_batch(cb, keep_packed=True)
    assert isinstance(packedb["drug_adj"], dict)
    np.testing.assert_allclose(np.asarray(packedb["drug_degrees"]),
                               np.asarray(dense["drug_degrees"]))

    model = build_model("DrugLAMPwoLLM", cfg, n_drug_feature=24,
                        n_prot_feature=40)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           dense, jax.random.key(2), method="init_all")
    s_dense = np.asarray(model.apply(variables, dense, train=False)["score"])
    s_packed = np.asarray(model.apply(variables, packedb, train=False)["score"])
    np.testing.assert_allclose(s_packed, s_dense, rtol=2e-4, atol=2e-5)
