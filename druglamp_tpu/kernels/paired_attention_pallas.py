"""Fused Pallas TPU kernels for PMMA paired attention and self-attention.

Why a kernel: XLA cannot fuse softmax between two matmuls, so the unfused
path writes the (L, S) probability matrices to HBM four times per mm-block
(self + guided, fwd + bwd).  At PMMA's shapes (L = S = 256, D = 64/128) one
(b, h) slice fits comfortably in VMEM, so each grid step computes

    P₁ = softmax(Q Kᵀ/√d) V   and   P₂ = softmax(Q_o Kᵀ/√d) V

with a single K/V load and no HBM round-trip for probabilities.  The guided
product reuses the same K/V tiles — the whole reason the reference pairs the
two streams (model/PMMA/attention.py:44-88).

The backward is also a Pallas kernel (standard softmax-attention gradient,
recomputing P from the saved inputs — flash-style rematerialization):

    dV  = Pᵀ dO
    dP  = dO Vᵀ
    dS  = P ⊙ (dP − rowsum(dP ⊙ P))
    dQ  = dS K/√d,   dK = dSᵀ Q/√d

with dK/dV accumulated across the self and guided products (shared K/V).
Numerics: logits/softmax in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode lets the kernels run (slowly) on CPU for numerics tests
INTERPRET = False


def _fwd_kernel(q_ref, k_ref, v_ref, qo_ref, o1_ref, o2_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    qo = qo_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)

    s1 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    p1 = jax.nn.softmax(s1, axis=-1)
    o1_ref[0] = jnp.dot(p1, v, preferred_element_type=jnp.float32).astype(o1_ref.dtype)

    s2 = jax.lax.dot_general(qo, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    p2 = jax.nn.softmax(s2, axis=-1)
    o2_ref[0] = jnp.dot(p2, v, preferred_element_type=jnp.float32).astype(o2_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, qo_ref, do1_ref, do2_ref,
                dq_ref, dk_ref, dv_ref, dqo_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    qo = qo_ref[0].astype(jnp.float32)
    do1 = do1_ref[0].astype(jnp.float32)
    do2 = do2_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)

    def grads(qq, do):
        s = jax.lax.dot_general(qq, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qq, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        return dq, dk, dv

    dq, dk1, dv1 = grads(q, do1)
    dqo, dk2, dv2 = grads(qo, do2)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dqo_ref[0] = dqo.astype(dqo_ref.dtype)
    dk_ref[0] = (dk1 + dk2).astype(dk_ref.dtype)
    dv_ref[0] = (dv1 + dv2).astype(dv_ref.dtype)


def _block_specs(n, L, S, D):
    spec = lambda l: pl.BlockSpec((1, l, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return [spec(L), spec(S), spec(S), spec(L)]


def _fwd_call(q, k, v, qo):
    B, H, L, D = q.shape
    S = k.shape[2]
    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)
    qof = qo.reshape(B * H, L, D)
    out_spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o1, o2 = pl.pallas_call(
        _fwd_kernel,
        interpret=INTERPRET,
        grid=(B * H,),
        in_specs=_block_specs(B * H, L, S, D),
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
                   jax.ShapeDtypeStruct((B * H, L, D), q.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 2 * L * S * D * B * H,
            bytes_accessed=(4 * L * D + 2 * S * D) * 4 * B * H,
            transcendentals=2 * L * S * B * H,
        ),
    )(qf, kf, vf, qof)
    return o1.reshape(B, H, L, D), o2.reshape(B, H, L, D)


@jax.custom_vjp
def paired_attention_pallas(q, k, v, qo):
    """(B,H,L,D),(B,H,S,D),(B,H,S,D),(B,H,L,D) → (self_out, guided_out)."""
    return _fwd_call(q, k, v, qo)


def _paired_fwd(q, k, v, qo):
    return _fwd_call(q, k, v, qo), (q, k, v, qo)


def _paired_bwd(res, cts):
    q, k, v, qo = res
    do1, do2 = cts
    B, H, L, D = q.shape
    S = k.shape[2]
    flat = lambda x: x.reshape(B * H, x.shape[2], D)
    spec = lambda l: pl.BlockSpec((1, l, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv, dqo = pl.pallas_call(
        _bwd_kernel,
        interpret=INTERPRET,
        grid=(B * H,),
        in_specs=[spec(L), spec(S), spec(S), spec(L), spec(L), spec(L)],
        out_specs=(spec(L), spec(S), spec(S), spec(L)),
        out_shape=(jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
                   jax.ShapeDtypeStruct((B * H, S, D), k.dtype),
                   jax.ShapeDtypeStruct((B * H, S, D), v.dtype),
                   jax.ShapeDtypeStruct((B * H, L, D), qo.dtype)),
    )(flat(q), flat(k), flat(v), flat(qo), flat(do1), flat(do2))
    rs = lambda x, l: x.reshape(B, H, l, D)
    return rs(dq, L), rs(dk, S), rs(dv, S), rs(dqo, L)


paired_attention_pallas.defvjp(_paired_fwd, _paired_bwd)


# --- plain self-attention (PMMA blocks 2-3) ---------------------------------

def _self_fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _self_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _self_call(q, k, v):
    B, H, L, D = q.shape
    S = k.shape[2]
    spec = lambda l: pl.BlockSpec((1, l, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        _self_fwd_kernel,
        interpret=INTERPRET,
        grid=(B * H,),
        in_specs=[spec(L), spec(S), spec(S)],
        out_specs=spec(L),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
    )(q.reshape(B * H, L, D), k.reshape(B * H, S, D), v.reshape(B * H, S, D))
    return o.reshape(B, H, L, D)


@jax.custom_vjp
def self_attention_pallas(q, k, v):
    return _self_call(q, k, v)


def _self_fwd(q, k, v):
    return _self_call(q, k, v), (q, k, v)


def _self_bwd(res, do):
    q, k, v = res
    B, H, L, D = q.shape
    S = k.shape[2]
    spec = lambda l: pl.BlockSpec((1, l, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        _self_bwd_kernel,
        interpret=INTERPRET,
        grid=(B * H,),
        in_specs=[spec(L), spec(S), spec(S), spec(L)],
        out_specs=(spec(L), spec(S), spec(S)),
        out_shape=(jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
                   jax.ShapeDtypeStruct((B * H, S, D), k.dtype),
                   jax.ShapeDtypeStruct((B * H, S, D), v.dtype)),
    )(q.reshape(B * H, L, D), k.reshape(B * H, S, D), v.reshape(B * H, S, D),
      do.reshape(B * H, L, D))
    return dq.reshape(B, H, L, D), dk.reshape(B, H, S, D), dv.reshape(B, H, S, D)


self_attention_pallas.defvjp(_self_fwd, _self_bwd)
