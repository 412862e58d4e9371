"""Roofline attribution of the train-step tiers from COMPILED cost analysis.

flop_audit.py reports pre-optimization HLO counts (fusion-invariant FLOPs,
but bytes are a gross upper bound).  This tool compiles each tier for the
active backend and reads the OPTIMIZED executable's cost analysis — the
bytes number then reflects post-fusion HBM traffic, which is what bounds a
bandwidth-limited step.  For each tier it reports:

  t_flops  = flops / peak_flops      (MXU-bound floor)
  t_bytes  = bytes / peak_bw         (HBM-bound floor)
  roofline = max(t_flops, t_bytes)   vs the measured step time

If measured >> roofline, the step is latency/serialization-bound (many
small fused kernels, scan overhead) rather than resource-bound — different
optimization playbook (batching/fusing ops, widening shapes) than "reduce
bytes" or "reduce FLOPs".

Compile-only: safe to run without exclusive chip use, but on the tunneled
runtime every new process blocks while the chip is busy — run it on a quiet
chip (queue it after training stages).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline_audit.py
    JAX_PLATFORMS=cpu python tools/roofline_audit.py   # code-path smoke
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def audit_compiled(model_name: str, use_ssl: bool, use_cm: bool,
                   batch_size: int, **tier_kwargs):
    import jax

    import bench

    step, state, batch, args, _ = bench.make_tier(
        model_name, use_ssl=use_ssl, use_cm=use_cm, batch_size=batch_size,
        **tier_kwargs)
    compiled = step.lower(state, batch, jax.random.key(0), *args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):   # some backends return one entry per module
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    t_flops_ms = flops / (V5E_BF16_PEAK_TFLOPS * 1e12) * 1e3
    t_bytes_ms = byts / (V5E_HBM_GBPS * 1e9) * 1e3
    out = {
        "gflop_per_pair": round(flops / batch_size / 1e9, 3),
        "bytes_mb_per_pair": round(byts / batch_size / 1e6, 2),
        "t_flops_ms": round(t_flops_ms, 3),
        "t_bytes_ms": round(t_bytes_ms, 3),
        "roofline_ms": round(max(t_flops_ms, t_bytes_ms), 3),
        "bound": "flops" if t_flops_ms >= t_bytes_ms else "bytes",
    }
    try:
        mem = compiled.memory_analysis()
        out["temp_mb"] = round(getattr(mem, "temp_size_in_bytes", 0) / 1e6, 1)
        out["peak_hbm_mb"] = round(
            (getattr(mem, "argument_size_in_bytes", 0)
             + getattr(mem, "output_size_in_bytes", 0)
             + getattr(mem, "temp_size_in_bytes", 0)) / 1e6, 1)
    except Exception:
        pass
    return out


def main():
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    tiers = {
        "cls_bs16": ("DrugLAMP", False, False, 16),
        "ssl_bs16": ("DrugLAMP", True, False, 16),
        "full_bs16": ("DrugLAMP2C2P", True, True, 16),
        "cls_bs64": ("DrugLAMP", False, False, 64),
    }
    out = {}
    for name, spec in tiers.items():
        out[name] = audit_compiled(*spec)
        print(f"[roofline] {name}: {json.dumps(out[name])}", flush=True)
    # measured reference points (bench.py, quiet chip, execution-proved)
    print(json.dumps({"note": "compare roofline_ms to measured step times: "
                              "cls 8.7-8.9 ms, ssl 14.3 ms, full 15.6 ms "
                              "(bs16); cls_bs64 ~37 ms"}))


if __name__ == "__main__":
    main()
