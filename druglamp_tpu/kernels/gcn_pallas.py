"""Fused Pallas TPU kernel: bit-packed adjacency → normalized GCN aggregate.

Why a kernel: the production input path ships drug graphs as bit-packed
adjacency (B, N, N/8) uint8 (data/encoding.py) and the decode step
materializes the dense normalized Â (B, N, N) every train step *inside the
epoch scan* — an 8.4 MB/batch HBM write plus three reads per GCN layer
(and three more in the backward).  At N = 512 the whole thing fits VMEM,
so each grid step instead

    unpacks one row-tile of A from the packed bits (VPU),
    forms   y = diag(n) · A · diag(n) · x + diag(n²·real) · x   (MXU)

without Â ever existing in HBM.  ``n = deg^(-1/2)`` and the diag(real) term
reproduce the reference's double self-loop on real atoms (the packed bits
carry a single self-loop everywhere; reference handler/dataset.py:213-222,
model/basic_model.py:579-638 sym-norm GraphConv).

The operator S = diag(n)(A + diag(real))diag(n) is symmetric, so the
custom VJP is one more call of the same kernel: dx = S dy.  Packed bits,
degrees and the real-atom mask are integer-derived data — their cotangents
are float0 zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from druglamp_tpu.kernels.dispatch import get_backend

# interpret mode lets the kernel run (slowly) on CPU for numerics tests
INTERPRET = False

_ROW_TILE = 256          # adjacency rows per grid step


def packed_degrees(packed: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """(B, N, N/8) uint8 bits + (B, N) real-atom mask → (B, N) f32 degrees.

    Row sums of the effective adjacency: popcount of the packed row (bonds +
    the universal single self-loop) plus one extra on real atoms (the second
    self-loop), matching data/encoding.decode_batch's dense construction."""
    pc = jax.lax.population_count(packed).astype(jnp.int32)
    return (jnp.sum(pc, axis=-1).astype(jnp.float32) + real)


def _unpack_rows(tile_u8, rows: int, n: int):
    """(rows, n/8) uint8 block → (rows, n) {0,1} int32 bits in the GROUP-64
    layout (data/encoding.pack_adjacency: column j lives in byte j mod n/8,
    bit j div n/8).  Strictly 2-D lane ops — concatenate eight copies along
    lanes, then shift each lane by its group index — because Mosaic can
    neither cross-lane-reshape int8 vectors nor cast uint8 to float
    directly; arithmetic runs in int32."""
    nb = n // 8
    t = tile_u8.astype(jnp.int32)                    # (rows, n/8)
    rep = jnp.concatenate([t] * 8, axis=1)           # rep[:, j] = t[:, j%nb]
    shifts = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1) // nb
    return (rep >> shifts) & 1


def _gcn_kernel(packed_ref, nrm_ref, n2r_ref, x_ref, y_ref):
    i = pl.program_id(1)
    rows = y_ref.shape[1]
    n, c = x_ref.shape[1], x_ref.shape[2]

    x = x_ref[0]                                     # (N, C) compute dtype
    nrm_full = nrm_ref[0]                            # (N, 1) f32
    a = _unpack_rows(packed_ref[0], rows, n)         # (rows, N) u8 {0,1}

    xs = (x * nrm_full).astype(x.dtype)              # fold col scale into x
    # HIGHEST keeps f32 inputs in the multi-pass MXU decomposition (the
    # default single bf16 pass costs ~1e-3 rel error).  It must NOT be set
    # for bf16 operands: Mosaic rejects fp32 contract precision on a bf16
    # lhs ("Bad lhs type" at tpu.matmul lowering).
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    agg = jax.lax.dot_general(a.astype(x.dtype), xs,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)

    # row-tile reads as VMEM ref slices (Mosaic has no value-level
    # dynamic_slice; pl.ds on a ref lowers to a supported sliced load)
    r0 = pl.multiple_of(i * rows, rows)
    nrm_rows = nrm_ref[0, pl.ds(r0, rows), :]
    n2r_rows = n2r_ref[0, pl.ds(r0, rows), :]
    x_rows = x_ref[0, pl.ds(r0, rows), :].astype(jnp.float32)
    y = nrm_rows.astype(jnp.float32) * agg + n2r_rows * x_rows
    y_ref[0] = y.astype(y_ref.dtype)


def _gcn_call(packed: jnp.ndarray, nrm: jnp.ndarray, n2r: jnp.ndarray,
              x: jnp.ndarray) -> jnp.ndarray:
    B, N, nbytes = packed.shape
    C = x.shape[-1]
    assert N % _ROW_TILE == 0
    rt = _ROW_TILE
    nrm2 = nrm.reshape(B, N, 1)                      # 2-D values in-kernel
    n2r2 = n2r.reshape(B, N, 1)

    return pl.pallas_call(
        _gcn_kernel,
        interpret=INTERPRET,
        grid=(B, N // rt),
        in_specs=[
            pl.BlockSpec((1, rt, nbytes), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * C,
            bytes_accessed=B * (N * nbytes + N * C * 2 * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(packed, nrm2, n2r2, x)


@jax.custom_vjp
def gcn_packed_matmul(packed, nrm, n2r, x):
    """Fused Â·x from packed bits.

    packed (B,N,N/8) u8, nrm (B,N) f32 = deg^(-1/2), n2r (B,N) f32 =
    nrm²·real, x (B,N,C) → (B,N,C) f32 (f32 accumulation, like the dense
    path's preferred_element_type)."""
    return _gcn_call(packed, nrm, n2r, x)


def _gcn_fwd(packed, nrm, n2r, x):
    # residuals must be arrays: carry x's dtype as a zero-size array
    return _gcn_call(packed, nrm, n2r, x), (packed, nrm, n2r,
                                            jnp.zeros((0,), x.dtype))


def _gcn_bwd(res, dy):
    packed, nrm, n2r, x_proto = res
    x_dtype = x_proto.dtype
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0) \
        if jnp.issubdtype(a.dtype, jnp.integer) else jnp.zeros_like(a)
    # S is symmetric: dx = S dy (same kernel); cotangent in the primal dtype
    return (f0(packed), jnp.zeros_like(nrm), jnp.zeros_like(n2r),
            _gcn_call(packed, nrm, n2r, dy.astype(x_dtype)).astype(x_dtype))


gcn_packed_matmul.defvjp(_gcn_fwd, _gcn_bwd)


def unpack_dense_adj(packed: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback: packed bits + real mask → dense effective adjacency
    (single self-loop everywhere from the packed diag, +1 on real atoms) —
    the same group-64 construction as data/encoding.decode_batch."""
    B, N, _ = packed.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)[:, None]
    bits = (packed[:, :, None, :] >> shifts) & jnp.uint8(1)   # (B,N,8,N/8)
    adj = bits.reshape(B, N, -1)
    eye = jnp.eye(N, dtype=adj.dtype)
    return adj + eye[None] * real[:, :, None].astype(adj.dtype)


def use_packed_gcn() -> bool:
    """Packed-path gate: OFF by default until the kernel is chip-validated
    for the running build (tools/gcn_kernel_bench.py); enable with
    DRUGLAMP_PACKED_GCN=1.  Tests force the path via
    dispatch.set_backend('pallas') + INTERPRET."""
    import os

    if os.environ.get("DRUGLAMP_PACKED_GCN", "0") != "1":
        return False
    return get_backend() == "pallas"
