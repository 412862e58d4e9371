"""Decompose the epoch-e2e cost: host assembly vs H2D vs device scan.

bench.py's epoch_e2e tier (371–457 pairs/s) runs far below the pure step
tier (1839 pairs/s); this tool attributes the gap at the same shapes:

  assembly   host-only stacked_epoch drain (featurized rows → compact
             stacked chunks), no device involved
  h2d        jnp.asarray of the stacked chunks + a D2H sync, minus a
             repeat-transfer baseline to cancel fixed dispatch costs
  device     the epoch scan on pre-staged device-resident chunks
  full       the real pipeline (assembly + h2d + scan interleaved), i.e.
             what bench.py measures

    PYTHONPATH=/root/repo:/root/.axon_site python tools/e2e_profile.py
"""

from __future__ import annotations

import os
import time

import numpy as np

BATCH = 16
ROWS = int(os.environ.get("DRUGLAMP_BENCH_E2E_ROWS", "1024"))
DATA_ROOT = os.environ.get("DRUGLAMP_DATA_ROOT", "/root/reference/datasets")
CACHE_ROOT = os.environ.get(
    "DRUGLAMP_EMBED_CACHE", os.path.join("results", "embed_cache", "human-random"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()

    from bench import _e2e_embeddings
    from druglamp_tpu.config import Config
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.encoding import decode_batch
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_epoch_step

    cfg = Config()
    ds = DTIDataset(DATA_ROOT, "human", "random", "train.csv",
                    max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
                    max_prot_resis=cfg.protein.max_resis, cutoff=ROWS)
    embeddings, store, input_label = _e2e_embeddings(cfg, ds.table)
    print(f"[e2e_profile] input={input_label} rows={ROWS}", flush=True)
    loader = BatchLoader(ds, BATCH, shuffle=True, drop_last=True,
                         embeddings=embeddings, seed=0, include_llm=True,
                         compact=True, emb_ordinals=store is not None)
    store_tree = store.tree if store is not None else None

    def shard(b):
        b = jax.tree.map(jnp.asarray, b)
        if store_tree is not None:
            b["_store"] = store_tree
        return b

    # --- 1. host assembly only -------------------------------------------
    def assembly_pass(ep):
        t0 = time.perf_counter()
        n, nbytes = 0, 0
        for stacked in loader.stacked_epoch(ep, cfg.solver.scan_chunk):
            n += int(stacked["labels"].shape[0]) * BATCH
            nbytes += sum(a.nbytes for a in jax.tree.leaves(stacked))
        return time.perf_counter() - t0, n, nbytes

    assembly_pass(0)                       # warm featurization caches
    t_asm, n_pairs, chunk_bytes = assembly_pass(1)
    print(f"[e2e_profile] assembly: {t_asm*1e3:.0f} ms "
          f"({n_pairs} pairs, {chunk_bytes/1e6:.1f} MB/epoch)", flush=True)

    # --- 2. H2D transfer --------------------------------------------------
    chunks = list(loader.stacked_epoch(2, cfg.solver.scan_chunk))

    def h2d_pass(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            for stacked in chunks:
                out = jax.tree.map(jnp.asarray, stacked)
        for a in jax.tree.leaves(out):
            np.asarray(a)                 # D2H sync of the last transfer
        return time.perf_counter() - t0

    h2d_pass(1)                            # warm
    ta, tb = h2d_pass(1), h2d_pass(3)
    t_h2d = (tb - ta) / 2
    print(f"[e2e_profile] h2d: {t_h2d*1e3:.0f} ms "
          f"({chunk_bytes/1e6:.1f} MB → {chunk_bytes/1e6/max(t_h2d,1e-9):.0f} MB/s)",
          flush=True)

    # --- 3. device-only epoch scan on pre-staged chunks -------------------
    model = build_model("DrugLAMP", cfg)
    dev_chunks = [shard(c) for c in chunks]
    def _init(b, store):
        ex_one = decode_batch(jax.tree.map(lambda x: x[0], b), store=store)
        return model.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          ex_one, jax.random.key(2), method="init_all")

    variables = jax.jit(_init)(
        {k: v for k, v in dev_chunks[0].items() if k != "_store"}, store_tree)
    epoch_fn = make_epoch_step(model, use_ssl=False, use_cm=False)
    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))

    def device_pass(reps):
        state = TrainState.create(jax.tree.map(jnp.copy, variables),
                                  use_ssl=False, use_cm=False)
        rng = jax.random.key(4)
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            for c in dev_chunks:
                out = epoch_fn(state, c, rng, *args)
                state, rng = out.state, out.rng
        float(np.asarray(out.cls_losses)[-1])   # D2H sync
        return time.perf_counter() - t0

    device_pass(1)                         # warm/compile
    ta, tb = device_pass(1), device_pass(3)
    t_dev = (tb - ta) / 2
    print(f"[e2e_profile] device scan: {t_dev*1e3:.0f} ms "
          f"({n_pairs/max(t_dev,1e-9):.0f} pairs/s device-only)", flush=True)

    # --- 4. full pipeline (what bench.py's e2e tier measures) -------------
    def full_pass(ep):
        state = TrainState.create(jax.tree.map(jnp.copy, variables),
                                  use_ssl=False, use_cm=False)
        rng = jax.random.key(4)
        t0 = time.perf_counter()
        for stacked in loader.stacked_epoch(ep, cfg.solver.scan_chunk):
            out = epoch_fn(state, shard(stacked), rng, *args)
            state, rng = out.state, out.rng
        jax.block_until_ready(state.params)
        float(np.asarray(out.cls_losses)[-1])
        return time.perf_counter() - t0

    full_pass(3)                           # warm
    t_full = full_pass(4)
    print(f"[e2e_profile] full: {t_full*1e3:.0f} ms "
          f"({n_pairs/max(t_full,1e-9):.0f} pairs/s) | unattributed "
          f"{max(t_full - t_asm - t_h2d - t_dev, 0.0)*1e3:.0f} ms",
          flush=True)

    # --- 5. device-resident dataset (--device-data) -----------------------
    from druglamp_tpu.data.device_data import (DeviceDataStore,
                                               train_index_plan)
    from druglamp_tpu.train.steps import make_epoch_step_gather

    if not DeviceDataStore.supports(loader):
        print("[e2e_profile] device-data: unsupported loader config; skipped",
              flush=True)
        return
    dd = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                               cfg.protein.seq_len,
                               include_llm=loader.include_llm,
                               emb_ordinals=loader.emb_ordinals)
    tree = dd.tree_for(ds)
    gather_fn = make_epoch_step_gather(model, use_ssl=False, use_cm=False,
                                       include_llm=loader.include_llm,
                                       emb_ordinals=loader.emb_ordinals)

    def dd_pass(ep, state, rng):
        idx = train_index_plan(loader._order(ep), BATCH)
        t0 = time.perf_counter()
        out = gather_fn(state, jnp.asarray(idx),
                        jnp.ones(idx.shape, jnp.float32), tree, store_tree,
                        rng, *args)
        float(np.asarray(out.cls_losses)[-1])   # D2H sync
        return time.perf_counter() - t0, out.state, out.rng

    state = TrainState.create(jax.tree.map(jnp.copy, variables),
                              use_ssl=False, use_cm=False)
    rng = jax.random.key(4)
    _, state, rng = dd_pass(0, state, rng)      # warm/compile
    t1, state, rng = dd_pass(1, state, rng)
    times = []
    for ep in (2, 3, 4):
        t, state, rng = dd_pass(ep, state, rng)
        times.append(t)
    t_dd = sum(times) / len(times)
    # two-point variant: one epoch's fixed dispatch+fetch cost cancels
    print(f"[e2e_profile] device-data epoch: {t_dd*1e3:.0f} ms "
          f"({n_pairs/max(t_dd,1e-9):.0f} pairs/s; one-dispatch epoch; "
          f"single-epoch incl fixed costs {t1*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
