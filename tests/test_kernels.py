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
