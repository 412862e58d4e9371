"""Measured-HBM-bandwidth probe: the roofline's *achievable* denominator.

The roofline audit (tools/roofline_audit.py) prices the byte floor at the
v5e paper number (819 GB/s).  No real kernel reaches paper bandwidth; the
honest "percent of achievable" denominator is what a pure streaming kernel
actually sustains on THIS chip through THIS runtime.  This probe measures
three canonical access patterns:

  copy    y = x * c            (read N, write N   -> 2N bytes / iter)
  triad   z = a*x + y          (read 2N, write N  -> 3N bytes / iter)
  reduce  s = sum over rows(x) (read N            -> ~N bytes / iter)

Each pattern is a K-iteration *data-dependent chain* inside ONE jitted
program (lax.fori_loop whose carry feeds the next iteration), timed with
the two-point fetch-synced method (utils.profiling.device_time_ms) and
divided by K.  The chain matters: timing K independent dispatches of a
sub-ms kernel through the tunneled runtime is unreliable — outputs of all
but the last call are freed immediately, so the runtime may elide or
overlap them (observed: a 512 MiB row-reduce "measured" 0.37 ms ==
1446 GB/s, above paper peak).  Inside one program every iteration is a
real, ordered HBM sweep.

Prints one JSON line per pattern and a summary line with the best achieved
GB/s, the paper peak, and the achieved/peak fraction.  Interpretation: a
training step whose bytes/time sits at >=90% of the *achieved* streaming
bandwidth is bandwidth-bound at the hardware's demonstrated limit — no
kernel-level work can buy more than the remaining fraction.

Usage: python tools/hbm_bandwidth_probe.py [--mib 512] [--chain 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PAPER_GBPS = 819.0  # TPU v5e HBM peak (tools/roofline_audit.py:35)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=512,
                    help="array size per operand in MiB (f32)")
    ap.add_argument("--chain", type=int, default=32,
                    help="dependent iterations per timed program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache
    from druglamp_tpu.utils.profiling import device_time_ms

    enable_compilation_cache()

    n = args.mib * (1 << 20) // 4          # f32 elements
    rows = 1 << 12
    cols = n // rows
    key = jax.random.key(0)
    x = jax.random.normal(key, (rows, cols), jnp.float32)
    y = jax.random.normal(jax.random.key(1), (rows, cols), jnp.float32)
    nbytes = x.size * 4

    K = args.chain

    # Every iteration's input is the previous iteration's output (or, for
    # reduce, the carry perturbs the next sweep), so no iteration can be
    # elided, reordered, or overlapped: K genuine ordered HBM sweeps.
    @jax.jit
    def copy_chain(x):
        return jax.lax.fori_loop(0, K, lambda i, v: v * 1.0000001, x)

    @jax.jit
    def triad_chain(x, y):
        return jax.lax.fori_loop(0, K, lambda i, v: 1.0000001 * v + y, x)

    @jax.jit
    def reduce_chain(x):
        def body(i, s):
            # s[0] is dynamic -> the multiply cannot be constant-folded;
            # each iteration re-reads all of x (tiny extra s traffic).
            return jnp.sum(x * (1.0 + 1e-30 * s[0]), axis=1)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((rows,), x.dtype))

    results = {}
    for name, fn, fargs, moved in (
        ("copy", copy_chain, (x,), 2 * nbytes),
        ("triad", triad_chain, (x, y), 3 * nbytes),
        ("reduce", reduce_chain, (x,), nbytes),
    ):
        ms = device_time_ms(fn, *fargs, n1=2, n2=6) / K
        gbps = moved / (ms * 1e-3) / 1e9
        results[name] = gbps
        print(json.dumps({"pattern": name, "ms": round(ms, 4),
                          "bytes_moved_mb": round(moved / 1e6, 1),
                          "achieved_gbps": round(gbps, 1)}), flush=True)

    best = max(results.values())
    print(json.dumps({"summary": "hbm_bandwidth_probe",
                      "best_achieved_gbps": round(best, 1),
                      "paper_peak_gbps": PAPER_GBPS,
                      "achieved_frac_of_peak": round(best / PAPER_GBPS, 3),
                      "operand_mib": args.mib}), flush=True)


if __name__ == "__main__":
    main()
