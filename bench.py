"""Benchmark: DrugLAMP training throughput (drug–target pairs/sec/chip).

Runs the flagship DrugLAMP model at the reference training recipe's shapes
(batch 16, 512-node drug graphs, 2304-residue tiled proteins — BASELINE.md)
and measures steady-state jitted train-step throughput on the available
accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numbers (BASELINE.md); the A100
PyTorch reference throughput is ESTIMATED at 100 pairs/sec/chip from its
FLOP count (~27 GFLOP/pair train) at the 5-15% MFU typical of small-shape
eager PyTorch with per-sample torch.load input I/O — to be replaced by a
measured number when a reference run is available.  vs_baseline =
measured / 100.
"""

from __future__ import annotations

import json
import time

A100_BASELINE_PAIRS_PER_SEC = 100.0
BATCH = 16
WARMUP = 3
ITERS = 50


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
    state = TrainState.create(variables, use_ssl=False, use_cm=False)
    step = make_train_step(model, use_ssl=False, use_cm=False)

    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))

    # Python step loop with async dispatch: all ITERS steps are enqueued
    # before blocking, so device execution pipelines and the measurement is
    # not serialized on per-call host latency.  (A steps-in-lax.scan variant
    # measures ~2.5x higher still, but its one-off compile through this
    # host's remote-compile relay takes >45 min — not viable for a driver
    # bench; the bare step program is shared with the real trainer and hits
    # the persistent compilation cache.)
    rng = jax.random.key(3)
    for _ in range(WARMUP):
        rng, k = jax.random.split(rng)
        state = step(state, batch, k, *args).state
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        rng, k = jax.random.split(rng)
        state = step(state, batch, k, *args).state
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
