"""Benchmark: DrugLAMP training throughput (drug–target pairs/sec/chip).

Runs the flagship DrugLAMP model at the reference training recipe's shapes
(batch 16, 512-node drug graphs, 2304-residue tiled proteins — BASELINE.md)
and measures steady-state jitted train-step throughput on the available
accelerator, in three tiers:

  value (headline)        cls-only step — BCE loss, one vjp, one AdamW
  full_step_pairs_per_sec SSL+CM step — 3 losses, 3 vjps, 3 AdamW applies
                          (the most expensive epoch-gate variant,
                          reference trainer.py:192-229)
  epoch_e2e_pairs_per_sec one full epoch wall-clock through the REAL
                          pipeline: host batch assembly from the human/random
                          CSV, compact encoding, H2D, epoch-in-scan dispatch

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline denominator: the reference repo publishes no numbers; the A100
PyTorch throughput is DERIVED from FLOP accounting in BASELINE.md §"A100
baseline derivation" (≈27 GFLOP/pair train at the 5–15% MFU band typical of
small-shape eager PyTorch with per-sample torch.load input I/O → 58–173
pairs/s; midpoint 100).  vs_baseline = value / 100.
"""

from __future__ import annotations

import json
import os
import time

A100_BASELINE_PAIRS_PER_SEC = 100.0   # derivation: BASELINE.md (5-15% MFU band)
BATCH = 16
WARMUP = 3
ITERS = 50
DATA_ROOT = os.environ.get("DRUGLAMP_DATA_ROOT", "/root/reference/datasets")
E2E_ROWS = int(os.environ.get("DRUGLAMP_BENCH_E2E_ROWS", "1024"))


def _measure_step(step, state, batch, args, rng):
    """Steady-state throughput of one jitted step fn (async dispatch: all
    ITERS steps enqueue before blocking, so execution pipelines)."""
    import jax

    for _ in range(WARMUP):
        rng, k = jax.random.split(rng)
        state = step(state, batch, k, *args).state
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        rng, k = jax.random.split(rng)
        state = step(state, batch, k, *args).state
    jax.block_until_ready(state.params)
    return BATCH * ITERS / (time.perf_counter() - t0)


def _measure_epoch_e2e(cfg):
    """Wall-clock pairs/s for one epoch of the real pipeline (CSV → host
    featurization/assembly → compact → H2D → scan-driver train steps).
    Dataset featurization (one-time, amortized across a run) is excluded;
    the first epoch warms the scan compile via the persistent cache."""
    import jax
    import jax.numpy as jnp

    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_epoch_step

    csv = os.path.join(DATA_ROOT, "human", "random", "train.csv")
    if not os.path.exists(csv):
        return None
    ds = DTIDataset(DATA_ROOT, "human", "random", "train.csv",
                    max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
                    max_prot_resis=cfg.protein.max_resis, cutoff=E2E_ROWS)
    loader = BatchLoader(ds, BATCH, shuffle=True, drop_last=True,
                         embeddings=ZeroEmbeddings(384, 640), seed=0,
                         include_llm=True, compact=True)
    model = build_model("DrugLAMP", cfg)
    example = next(iter(loader.stacked_epoch(0, cfg.solver.scan_chunk)))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           jax.tree.map(lambda x: jnp.asarray(x[0]), example),
                           jax.random.key(2), method="init_all")
    epoch_fn = make_epoch_step(model, use_ssl=False, use_cm=False)
    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))

    def run_epoch(ep):
        state = TrainState.create(
            jax.tree.map(jnp.copy, variables), use_ssl=False, use_cm=False)
        rng = jax.random.key(4)
        n = 0
        t0 = time.perf_counter()
        for stacked in loader.stacked_epoch(ep, cfg.solver.scan_chunk):
            n += int(stacked["labels"].shape[0]) * BATCH
            out = epoch_fn(state, jax.tree.map(jnp.asarray, stacked), rng, *args)
            state, rng = out.state, out.rng
        jax.block_until_ready(state.params)
        return n / (time.perf_counter() - t0)

    run_epoch(0)           # warm: compiles (persistent-cache backed)
    return run_epoch(1)


def main() -> None:
    import jax

    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from druglamp_tpu.config import Config
    from druglamp_tpu.data.loader import build_cm_arrays
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_train_step
    from druglamp_tpu.utils.synthetic import make_batch

    cfg = Config()
    batch = make_batch(cfg, BATCH, n_drug_feature=384, n_prot_feature=640)
    batch["cm"] = build_cm_arrays(np.arange(BATCH) % 5, np.arange(BATCH) % 7,
                                  batch["labels"])
    batch = jax.tree.map(jnp.asarray, batch)

    model = build_model("DrugLAMP", cfg)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))

    def fresh_state(use_ssl, use_cm):
        return TrainState.create(jax.tree.map(jnp.copy, variables),
                                 use_ssl=use_ssl, use_cm=use_cm)

    cls_pps = _measure_step(
        make_train_step(model, use_ssl=False, use_cm=False),
        fresh_state(False, False), batch, args, jax.random.key(3))

    full_pps = _measure_step(
        make_train_step(model, use_ssl=True, use_cm=True),
        fresh_state(True, True), batch, args, jax.random.key(3))

    try:
        e2e_pps = _measure_epoch_e2e(cfg)
    except Exception as e:   # the headline number must survive a bad e2e env
        print(f"[bench] epoch_e2e failed: {e!r}", flush=True)
        e2e_pps = None

    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip",
        "value": round(cls_pps, 2),
        "unit": "pairs/s",
        "vs_baseline": round(cls_pps / A100_BASELINE_PAIRS_PER_SEC, 3),
        "full_step_pairs_per_sec": round(full_pps, 2),
        "epoch_e2e_pairs_per_sec": round(e2e_pps, 2) if e2e_pps else None,
        "baseline_derivation": "BASELINE.md#a100-baseline-derivation",
    }))


if __name__ == "__main__":
    main()
