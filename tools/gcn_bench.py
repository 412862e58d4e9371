"""GCN formulation microbenchmark: dense normalized-adjacency matmul vs
gather/segment-sum message passing, at DrugLAMP shapes (B=16, N=512, C=128).

Backs the design decision in nn/gcn.py (SURVEY §2.9: "benchmark both, the
dense path is likely MXU-optimal at 512").  Run on TPU:
    PYTHONPATH=. python tools/gcn_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, C, E = 16, 512, 128, 2048  # E = padded edge count per molecule


def make_inputs(seed=0):
    r = np.random.RandomState(seed)
    x = r.randn(B, N, C).astype(np.float32)
    adj = np.zeros((B, N, N), np.uint8)
    edges = np.zeros((B, 2, E), np.int32)
    for b in range(B):
        n_atoms = 40
        k = 0
        for i in range(n_atoms - 1):
            adj[b, i, i + 1] = adj[b, i + 1, i] = 1
            edges[b, :, k] = (i, i + 1); k += 1
            edges[b, :, k] = (i + 1, i); k += 1
        for i in range(N):
            adj[b, i, i] = 2 if i < n_atoms else 1
        # pad remaining edge slots with self-edges on node 0 weighted 0 later
        edges[b, :, k:] = 0
    deg = adj.sum(-1).astype(np.float32)
    edge_valid = (np.arange(E)[None, :] < 78).astype(np.float32) * np.ones((B, 1))
    return (jnp.asarray(x), jnp.asarray(adj), jnp.asarray(deg),
            jnp.asarray(edges), jnp.asarray(edge_valid))


@jax.jit
def dense_gcn(x, adj, deg):
    n = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    a = (n[:, :, None] * adj.astype(jnp.float32)) * n[:, None, :]
    return jax.lax.dot_general(a, x, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


@jax.jit
def segment_gcn(x, edges, deg, edge_valid):
    # per-sample gather src rows, scale, scatter-add to dst (+ self loops)
    n = jax.lax.rsqrt(jnp.maximum(deg, 1.0))

    def one(xb, eb, nb, vb):
        src, dst = eb[0], eb[1]
        msgs = xb[src] * (nb[src] * nb[dst] * vb)[:, None]
        agg = jnp.zeros_like(xb).at[dst].add(msgs)
        # self-loop multiplicity handled as 2/1 diag: approximate with 2x self
        return agg + (nb * nb * 2.0)[:, None] * xb

    return jax.vmap(one)(x, edges, n, edge_valid)


def timeit(fn, *args):
    # two-point measurement: fixed dispatch/fetch costs cancel (see
    # druglamp_tpu.utils.profiling.device_time_ms); µs
    from druglamp_tpu.utils.profiling import device_time_ms

    return device_time_ms(fn, *args, n1=20, n2=100) * 1e3


if __name__ == "__main__":
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    x, adj, deg, edges, ev = make_inputs()
    t_dense = timeit(dense_gcn, x, adj, deg)
    t_seg = timeit(segment_gcn, x, edges, deg, ev)
    print(f"dense   ÂX  (B{B} N{N} C{C}):        {t_dense:.0f} us")
    print(f"segment gather/scatter (E={E}):      {t_seg:.0f} us")
    print(f"dense is {t_seg / t_dense:.2f}x {'faster' if t_seg > t_dense else 'slower'}")
