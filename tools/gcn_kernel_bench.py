"""On-chip validation + microbenchmark of the fused packed-GCN kernel.

Compares kernels/gcn_pallas.gcn_packed_matmul against the dense
decode-then-matmul path (data/encoding.decode_batch + Â·X) for numerics and
timing at the production shapes (B=16, N=512, C=128, bf16):

    PYTHONPATH=.:/root/.axon_site python tools/gcn_kernel_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args):
    # two-point measurement: fixed dispatch/fetch costs cancel (see
    # druglamp_tpu.utils.profiling.device_time_ms).  Sub-ms kernels need
    # many iterations per point or enqueue-time noise dominates the
    # difference (observed: negative readings at n1=10/n2=40).
    from druglamp_tpu.utils.profiling import device_time_ms

    return device_time_ms(fn, *args, n1=50, n2=400)


def main():
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import druglamp_tpu.kernels.gcn_pallas as gk

    B, N, C = 16, 512, 128
    r = np.random.RandomState(0)
    n_atoms = r.randint(N // 8, N // 2, size=B)
    adj = np.zeros((B, N, N), np.uint8)
    idx = np.arange(N)
    for b in range(B):
        na = n_atoms[b]
        for _ in range(3 * na):
            i, j = r.randint(0, na, 2)
            adj[b, i, j] = adj[b, j, i] = 1
        adj[b, idx, idx] = 1
    from druglamp_tpu.data.encoding import pack_adjacency

    packed = jnp.asarray(pack_adjacency(adj))
    real = jnp.asarray((idx[None, :] < n_atoms[:, None]).astype(np.float32))
    x32 = r.randn(B, N, C).astype(np.float32)

    deg = gk.packed_degrees(packed, real)
    nrm = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    n2r = nrm * nrm * real

    adj_eff = jnp.asarray(adj) + jnp.eye(N, dtype=jnp.uint8)[None] * \
        real[:, :, None].astype(jnp.uint8)
    ahat32 = (nrm[:, :, None] * adj_eff.astype(jnp.float32)) * nrm[:, None, :]

    # float64 host ground truth — the on-chip "dense reference" itself runs
    # MXU bf16 passes at default precision, so kernel-vs-dense alone cannot
    # attribute error
    ahat64 = np.asarray(ahat32, np.float64)
    truth = np.einsum("bij,bjc->bic", ahat64, x32.astype(np.float64))
    tnorm = np.abs(truth).max()

    for dtype, tol in ((jnp.float32, 2e-4), (jnp.bfloat16, 3e-2)):
        x = jnp.asarray(x32, dtype)
        ahat = ahat32.astype(dtype)

        dense = jax.jit(lambda a, xx: jax.lax.dot_general(
            a, xx, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
        kern = jax.jit(gk.gcn_packed_matmul)

        y_ref = np.asarray(dense(ahat, x))
        y = np.asarray(kern(packed, nrm, n2r, x))
        err_k = np.abs(y - truth).max() / tnorm
        err_d = np.abs(y_ref - truth).max() / tnorm
        print(f"[{dtype.__name__}] fwd rel-err vs f64: kernel {err_k:.2e} "
              f"| dense path {err_d:.2e}", flush=True)
        assert err_k < tol, f"kernel numerics: {err_k}"
        assert err_k < max(2 * err_d, tol), \
            f"kernel worse than dense path: {err_k} vs {err_d}"

        # fwd+bwd through the custom VJP vs f64 truth (d/dx sum(y²) = 2 S y)
        g_truth = 2 * np.einsum("bij,bjc->bic", ahat64, truth)
        gn = np.abs(g_truth).max()
        loss_k = jax.jit(jax.grad(
            lambda xx: jnp.sum(gk.gcn_packed_matmul(packed, nrm, n2r, xx) ** 2)))
        loss_d = jax.jit(jax.grad(
            lambda xx: jnp.sum(dense(ahat, xx) ** 2)))
        gerr_k = np.abs(np.asarray(loss_k(x), np.float64) - g_truth).max() / gn
        gerr_d = np.abs(np.asarray(loss_d(x), np.float64) - g_truth).max() / gn
        print(f"[{dtype.__name__}] bwd rel-err vs f64: kernel {gerr_k:.2e} "
              f"| dense path {gerr_d:.2e}", flush=True)
        assert gerr_k < max(2 * gerr_d, 3 * tol), f"grad: {gerr_k} vs {gerr_d}"

        t_k = timeit(kern, packed, nrm, n2r, x)
        t_d = timeit(dense, ahat, x)
        # the dense path also pays decode (unpack+normalize) per step:
        decode = jax.jit(lambda p, rr: (
            (nrm[:, :, None] * gk.unpack_dense_adj(p, rr).astype(jnp.float32))
            * nrm[:, None, :]).astype(dtype))
        t_dec = timeit(decode, packed, real)
        print(f"[{dtype.__name__}] kernel {t_k:.3f} ms | dense matmul {t_d:.3f} ms "
              f"| decode(unpack+norm) {t_dec:.3f} ms | dense total {t_d + t_dec:.3f} ms",
              flush=True)

    print("gcn kernel validation OK")


if __name__ == "__main__":
    main()
