"""Measured-HBM-bandwidth probe: the roofline's *achievable* denominator.

The roofline audit (tools/roofline_audit.py) prices the byte floor at the
v5e paper number (819 GB/s).  No real kernel reaches paper bandwidth; the
honest "percent of achievable" denominator is what a pure streaming kernel
actually sustains on THIS chip through THIS runtime.  This probe measures
three canonical access patterns with the two-point fetch-synced method
(utils.profiling.device_time_ms — the same methodology as bench.py):

  copy    y = x * c            (read N, write N   -> 2N bytes)
  triad   z = a*x + y          (read 2N, write N  -> 3N bytes)
  reduce  s = sum over rows(x) (read N            -> ~N bytes)

Prints one JSON line per pattern and a summary line with the best achieved
GB/s, the paper peak, and the achieved/peak fraction.  Interpretation: a
training step whose bytes/time sits at >=90% of the *achieved* streaming
bandwidth is bandwidth-bound at the hardware's demonstrated limit — no
kernel-level work can buy more than the remaining fraction.

Usage: python tools/hbm_bandwidth_probe.py [--mib 256]
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
    ap.add_argument("--mib", type=int, default=256,
                    help="array size per operand in MiB (f32)")
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

    copy = jax.jit(lambda x: x * 1.0000001)
    triad = jax.jit(lambda x, y: 1.0000001 * x + y)
    # keep a small output so the fetch is cheap but the read is full
    reduce_ = jax.jit(lambda x: jnp.sum(x, axis=1))

    results = {}
    for name, fn, fargs, moved in (
        ("copy", copy, (x,), 2 * nbytes),
        ("triad", triad, (x, y), 3 * nbytes),
        ("reduce", reduce_, (x,), nbytes),
    ):
        ms = device_time_ms(fn, *fargs, n1=10, n2=40)
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
