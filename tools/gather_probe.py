"""Micro-benchmark of embedding-store gather strategies on the real chip.

The r5 gather-epoch trace (docs/artifacts/xprof_epoch_r5.log) shows XLA's
lowering of ``jnp.take(store[2001,1024,640]bf16, 16 ids)`` costing ~8 ms/step
(fusion.3675 5.9 ms + mini-gather-slice 2.0 ms — whole-operand work per
step), which doubles the dd train step (17.5 vs 8.9 ms).  This probe times
the candidate replacements over a K-iteration data-dependent chain (the
hbm_bandwidth_probe methodology — nothing elidable):

  take3d     jnp.take(axis=0) on the (E, L, F) store (status quo)
  take2d     reshape to (E, L*F) then take, reshape back
  onehot     one-hot (B, E) bf16 @ (E, L*F)  — MXU path
  dslice     lax.scan of B dynamic_slice rows (DMA path)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/gather_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

E, L, F = 2001, 1024, 640
B = 16
K = 32


def chain(fn, ids0, store):
    """K gathers, each feeding one element back into the next's index —
    data-dependent so no iteration can be elided."""

    def body(i, carry):
        ids, acc = carry
        out = fn(store, ids)                       # (B, L, F)
        acc = acc + out[0, 0, 0].astype(jnp.float32)   # consumed via carry
        ids = (ids + jnp.int32(1)) % E
        return ids, acc

    # while-loop iterations execute sequentially on device and the final acc
    # is fetched, so no gather can be elided
    return jax.lax.fori_loop(0, K, body, (ids0, jnp.float32(0.0)))


def take3d(store, ids):
    return jnp.take(store, ids, axis=0)


def take2d(store, ids):
    flat = store.reshape(E, L * F)
    return jnp.take(flat, ids, axis=0).reshape(ids.shape[0], L, F)


def onehot(store, ids):
    oh = jax.nn.one_hot(ids, E, dtype=store.dtype)          # (B, E)
    flat = store.reshape(E, L * F)
    return (oh @ flat).reshape(ids.shape[0], L, F)


def dslice(store, ids):
    def one(i):
        return jax.lax.dynamic_slice(store, (i, 0, 0), (1, L, F))[0]

    return jax.lax.map(one, ids)


def main():
    store = jnp.zeros((E, L, F), jnp.bfloat16)
    ids0 = jnp.arange(B, dtype=jnp.int32) * 7 % E
    for name, fn in [("take3d", take3d), ("take2d", take2d),
                     ("onehot", onehot), ("dslice", dslice)]:
        # store passed as an argument — closing over it would bake a 2.6 GB
        # constant into the program
        f = jax.jit(lambda ids, st, fn=fn: chain(fn, ids, st))
        out = f(ids0, store)
        float(np.asarray(out[1]))               # warm + sync
        t1 = time.perf_counter()
        out = f(ids0, store)
        float(np.asarray(out[1]))
        dt = (time.perf_counter() - t1)
        per = dt / K * 1e3
        mb = B * L * F * 2 / 1e6
        print(f"{name:8s} {per:8.3f} ms/gather   ({mb:.1f} MB out -> "
              f"{mb / per:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
