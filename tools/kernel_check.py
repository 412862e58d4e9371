"""On-TPU validation + microbenchmark of the Pallas attention kernels.

Compares pallas vs XLA-fallback outputs and gradients at PMMA shapes, then
times both. Run on a TPU host: python tools/kernel_check.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from druglamp_tpu.kernels import dispatch
from druglamp_tpu.kernels.paired_attention import paired_attention_core, self_attention_core


def check(B, H, L, S, D, dtype):
    k = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(k[0], (B, H, L, D), dtype)
    kk = jax.random.normal(k[1], (B, H, S, D), dtype)
    v = jax.random.normal(k[2], (B, H, S, D), dtype)
    qo = jax.random.normal(k[3], (B, H, L, D), dtype)

    def run(backend, with_grad):
        dispatch.set_backend(backend)

        @jax.jit
        def f(q, kk, v, qo):
            s, g, _, _ = paired_attention_core(q, kk, v, qo)
            return (s * 1.0).sum() + (g * 2.0).sum()

        @jax.jit
        def fg(q, kk, v, qo):
            return jax.grad(lambda *a: f(*a), argnums=(0, 1, 2, 3))(q, kk, v, qo)

        @jax.jit
        def fwd(q, kk, v, qo):
            s, g, _, _ = paired_attention_core(q, kk, v, qo)
            return s, g

        out = fwd(q, kk, v, qo)
        grads = fg(q, kk, v, qo) if with_grad else None
        jax.block_until_ready(out)
        return out, grads, fwd, fg

    (s_p, g_p), gr_p, fwd_p, fg_p = run("pallas", True)
    (s_x, g_x), gr_x, fwd_x, fg_x = run("xla", True)

    # TPU matmuls run at MXU default precision even for fp32 inputs, so the
    # two implementations differ at bf16-mantissa level regardless of dtype
    tol = 5e-2 if dtype == jnp.bfloat16 else 5e-3
    for name, a, b in [("self", s_p, s_x), ("guided", g_p, g_x)]:
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"  {name} fwd max|Δ| = {d:.2e}  ({'OK' if d < tol else 'FAIL'})")
    for name, a, b in zip("q k v qo".split(), gr_p, gr_x):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"  d{name} max|Δ| = {d:.2e}  ({'OK' if d < 10 * tol else 'FAIL'})")

    def timeit(fn, *args, iters=50):
        fn(*args)
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e6

    t_fp = timeit(fwd_p, q, kk, v, qo)
    t_fx = timeit(fwd_x, q, kk, v, qo)
    t_gp = timeit(fg_p, q, kk, v, qo)
    t_gx = timeit(fg_x, q, kk, v, qo)
    print(f"  fwd: pallas {t_fp:.0f}us  xla {t_fx:.0f}us  ({t_fx / t_fp:.2f}x)")
    print(f"  f+g: pallas {t_gp:.0f}us  xla {t_gx:.0f}us  ({t_gx / t_gp:.2f}x)")
    dispatch.set_backend(None)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"== mm-block paired attention B16 H4 L256 S256 D64 {dtype.__name__}")
        check(16, 4, 256, 256, 64, dtype)
        print(f"== wide self-attn shapes B16 H4 L256 S256 D128 {dtype.__name__}")
        check(16, 4, 256, 256, 128, dtype)
