"""XLA-derived FLOP audit of the train-step tiers.

BASELINE.md's MFU accounting uses a hand-derived ~21 GFLOP/pair for the cls
train step (fwd ~7 GFLOP/pair x3 for fwd+bwd).  This tool replaces the hand
model with XLA's own HLO cost analysis: it lowers each bench tier's jitted
step at the full recipe shapes and reports flops/pair, transcendentals/pair
and bytes-accessed/pair straight from ``Lowered.cost_analysis()``.  FLOP
counts are fusion-invariant (matmul/conv contractions dominate), so the
pre-optimization number is the right numerator for MFU.

Runs on any backend (pure lowering, no device execution needed for the
counts):

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/flop_audit.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit_tier(model_name: str, use_ssl: bool, use_cm: bool, batch_size: int,
               **tier_kwargs):
    import jax

    import bench

    step, state, batch, args, _ = bench.make_tier(
        model_name, use_ssl=use_ssl, use_cm=use_cm, batch_size=batch_size,
        **tier_kwargs)
    rng = jax.random.key(0)
    lowered = step.lower(state, batch, rng, *args)
    ca = lowered.cost_analysis()
    return {
        "gflop_per_pair": round(ca["flops"] / batch_size / 1e9, 3),
        "transcendental_m_per_pair": round(
            ca.get("transcendentals", 0.0) / batch_size / 1e6, 3),
        # pre-fusion upper bound: lowered (unoptimized) HLO re-counts every
        # producer/consumer edge XLA will fuse away; real HBM traffic is far
        # lower.  FLOPs, by contrast, are fusion-invariant.
        "prefusion_bytes_gb_per_pair": round(
            ca.get("bytes accessed", 0.0) / batch_size / 1e9, 4),
    }


def main():
    tiers = {
        "cls_bs16": ("DrugLAMP", False, False, 16),
        "ssl_bs16": ("DrugLAMP", True, False, 16),
        "full_bs16": ("DrugLAMP2C2P", True, True, 16),
        "cls_bs64": ("DrugLAMP", False, False, 64),
    }
    out = {}
    for name, spec in tiers.items():
        out[name] = audit_tier(*spec)
        print(f"[flop_audit] {name}: {out[name]}", flush=True)
    import bench

    out["bench_assumed_gflop_per_pair"] = bench.TRAIN_GFLOP_PER_PAIR
    print(json.dumps(out))


if __name__ == "__main__":
    main()
