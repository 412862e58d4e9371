"""Benchmark: DrugLAMP training throughput (drug–target pairs/sec/chip).

Runs the flagship models at the reference training recipe's shapes
(batch 16, 512-node drug graphs, 2304-residue tiled proteins — BASELINE.md)
and measures steady-state jitted train-step throughput on the available
accelerator.  Step tiers are measured with train.steps.make_repeat_step —
SCAN_ITERS steps per dispatch — so the numbers are device-bound: on this
container's tunneled TPU a per-step dispatch loop measures host dispatch
latency (~100–150 ms/call vs ~4 ms device compute) and collapses under
concurrent host load.

DRIVER CONTRACT (round-3 failure: the official bench timed out from a cold
XLA cache before printing anything — BENCH_r03.json rc=124, parsed=null):

- The HEADLINE tier (DrugLAMP cls step) runs FIRST and its JSON line prints
  the moment it completes, with the remaining tiers still null and
  ``"partial": true``.
- Every remaining tier is gated on a wall-clock budget
  (``DRUGLAMP_BENCH_BUDGET_S``, default 540 s).  Tier cost is estimated from
  the headline's three separately-timed PHASES (setup / compile / execute):
  compile estimates track the persistent-cache state, execute estimates
  scale with each tier's audited FLOPs (r4 postmortem: scaling the WHOLE
  headline cost — a 388 s driver cold compile included — predicted 466-622 s
  for tiers whose warm cost is 30-90 s and skipped everything).  A tier that
  doesn't fit runs its SALVAGE variant (fewer measurement reps / a shorter
  e2e slice, reusing the same compiled programs) before being skipped; runs
  in reduced form are listed in ``"salvaged"``, true skips in ``"skipped"``.
- Tiers run in information-value order (ssl → e2e_dd → full → e2e) and an
  updated partial JSON line prints as results land, so a killed run still
  leaves the most valuable measurements in its tail.
- The final enriched JSON line has ``"partial": false``.  Every line carries
  the full schema, so a line-oriented parser may take the last line printed.
- The persistent XLA compile cache lives INSIDE the repo workspace
  (``<repo>/.jax_cache`` — utils/jaxsetup.default_cache_dir), so a cache
  primed during the round survives home-dir wipes and the driver's headline
  never pays the 388 s cold compile again.

Tiers:

  value (headline)        DrugLAMP cls-only step — BCE loss, one vjp, one AdamW
  ssl_step_pairs_per_sec  DrugLAMP SSL epoch-gate step (the flagship recipe's
                          most expensive variant: configs/DrugLAMP.yaml sets
                          SSL=True, CM=False — reference configs/DrugLAMP.yaml)
  full_step_pairs_per_sec DrugLAMP2C2P SSL+CM step — 3 losses, 3 vjps, 3 AdamW
                          applies (the most expensive gate variant across the
                          model zoo; 2C2P is the only variant that emits CM
                          inputs, reference model/DrugLAMP2C2P.py:54-63 —
                          plain DrugLAMP returns None for cm,
                          model/DrugLAMP.py:77)
  epoch_e2e_pairs_per_sec one full epoch wall-clock through the REAL
                          pipeline: host batch assembly from the human/random
                          CSV, compact encoding, H2D, epoch-in-scan dispatch.
                          ``epoch_e2e_input`` labels the embedding source:
                          "cache+store" (on-disk frozen-embedding cache +
                          device-resident store), "cache" (cache, host-shipped
                          dense), "zero-store" (no cache on disk: store backed
                          by zero VALUES but real per-entity token LENGTHS —
                          same bytes, same gathers, same step math as
                          cache+store), or "zeros" (dense zero arrays shipped
                          per batch — only when the store exceeds HBM budget).
  epoch_e2e_dd_pairs_per_sec  the same epoch via the device-resident dataset
                          (data/device_data.py, --device-data on): the
                          dataset lives in HBM and each epoch ships only the
                          (S, B) int32 index plan.  The A/B partner for
                          epoch_e2e; requires the ordinal embedding store.

Opt-in extras (DRUGLAMP_BENCH_EXTRA=1; both proved their point in r3 —
bs64 showed no free headroom, per-dispatch quantified the tunnel):

  cls_bs64_pairs_per_sec  the same cls step at batch 64 (headroom probe)
  per_dispatch_pairs_per_sec  the old per-step-dispatch loop (host overhead)

Baseline denominator: the reference repo publishes no numbers; the A100
PyTorch throughput is DERIVED from FLOP accounting in BASELINE.md §"A100
baseline derivation" (≈27 GFLOP/pair train at the 5–15% MFU band typical of
small-shape eager PyTorch with per-sample torch.load input I/O → a 58–173
pairs/s BAND).  vs_baseline = value / 100 (band midpoint; systematic ±1.7×).

MFU accounting (the unimpeachable number): per-pair step FLOPs come from
XLA's HLO cost analysis of the lowered step at recipe shapes
(tools/flop_audit.py: cls 25.5 / ssl 55.0 / full 76.7 GFLOP/pair —
fusion-invariant counts incl. optimizer+BN+decode), so tflops_per_sec =
pairs/s × gflop/1e3 and mfu = tflops / chip bf16 peak (TPU v5e:
197 TFLOP/s bf16).
"""

from __future__ import annotations

import json
import math
import os
import time

A100_BASELINE_PAIRS_PER_SEC = 100.0   # band midpoint: BASELINE.md (5-15% MFU)
A100_BASELINE_BAND = (58.0, 173.0)
# XLA HLO cost analysis of the lowered step at recipe shapes
# (tools/flop_audit.py; supersedes BASELINE.md's hand-derived ~21)
TRAIN_GFLOP_PER_PAIR = 25.5           # cls tier
SSL_GFLOP_PER_PAIR = 55.0             # DrugLAMP SSL-gate tier
FULL_GFLOP_PER_PAIR = 76.7            # 2C2P SSL+CM tier
V5E_BF16_PEAK_TFLOPS = 197.0
BATCH = 16
WARMUP = 3
ITERS = 50
SCAN_ITERS = int(os.environ.get("DRUGLAMP_BENCH_SCAN_ITERS", "128"))
SCAN_REPS = 4   # D2H sync latency (~100-150 ms tunneled) amortizes over reps
DATA_ROOT = os.environ.get("DRUGLAMP_DATA_ROOT", "/root/reference/datasets")
E2E_ROWS = int(os.environ.get("DRUGLAMP_BENCH_E2E_ROWS", "1024"))
CACHE_ROOT = os.environ.get(
    "DRUGLAMP_EMBED_CACHE", os.path.join("results", "embed_cache", "human-random"))
# total wall-clock budget; the driver's timeout killed r3's bench (rc=124),
# so every tier after the headline is gated on what's left of this.
# Driver window evidence: r4 exited cleanly at 556 s elapsed (rc=0) and the
# r3 kill implies a hard cap ≈ 720 s; 630 + worst-tier overshoot (~50 s)
# stays inside it while fitting ssl+full+e2e_dd after a warm preamble.
BUDGET_S = float(os.environ.get("DRUGLAMP_BENCH_BUDGET_S", "630"))
EXTRA_TIERS = os.environ.get("DRUGLAMP_BENCH_EXTRA", "0") == "1"


def make_tier(model_name: str, use_ssl: bool, use_cm: bool, cfg=None,
              batch_size: int = BATCH, n_drug_feature: int = 384,
              n_prot_feature: int = 640):
    """Build (step_fn, state, batch, args, model) for one train-step tier.

    Kept as a standalone factory so the test suite can construct every tier
    on a tiny config (tests/test_bench_smoke.py) — a tier that only a
    round-end driver run would execute must never ship unexercised."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from druglamp_tpu.config import Config
    from druglamp_tpu.data.loader import build_cm_arrays
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_train_step
    from druglamp_tpu.utils.synthetic import make_batch

    cfg = cfg or Config()
    batch = make_batch(cfg, batch_size, n_drug_feature=n_drug_feature,
                       n_prot_feature=n_prot_feature)
    if use_cm:
        batch["cm"] = build_cm_arrays(np.arange(batch_size) % 5,
                                      np.arange(batch_size) % 7,
                                      batch["labels"])
    if os.environ.get("DRUGLAMP_BENCH_DENSE", "0") != "1":
        # production-true: the CLI training path ships COMPACT batches and
        # the step decodes them on device (steps.py:79), so the headline
        # includes the decode cost (and the packed-GCN kernel when enabled)
        from druglamp_tpu.data.encoding import compact_batch

        n_atoms = (batch["d_fill"] == 0).sum(axis=1).astype(np.int32)
        batch = compact_batch(batch, n_atoms)
    batch = jax.tree.map(jnp.asarray, batch)

    model = build_model(model_name, cfg, n_drug_feature=n_drug_feature,
                        n_prot_feature=n_prot_feature)
    # init_all consumes the decoded form (the train step decodes internally,
    # steps.py:79); decode inside the SAME jitted program as the init —
    # flax init is eager, and through a tunneled runtime per-op dispatch
    # costs ~100 ms/RPC, so an un-jitted full-shape init costs ~4 MINUTES
    # (probe, r4) vs one compiled program
    from druglamp_tpu.data.encoding import decode_batch

    def init_fn(b):
        return model.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          decode_batch(dict(b)), jax.random.key(2),
                          method="init_all")

    variables = jax.jit(init_fn)(batch)
    state = TrainState.create(variables, use_ssl=use_ssl, use_cm=use_cm)
    step = make_train_step(model, use_ssl=use_ssl, use_cm=use_cm)
    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))
    return step, state, batch, args, model


def _measure_step(step, state, batch, args, rng, iters: int = ITERS,
                  warmup: int = WARMUP, batch_size: int = BATCH):
    """Steady-state throughput of one jitted step fn (async dispatch: all
    iters steps enqueue before blocking, so execution pipelines)."""
    import jax

    import numpy as np

    def run(n):
        nonlocal state, rng
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            rng, k = jax.random.split(rng)
            out = step(state, batch, k, *args)
            state = out.state
        float(np.asarray(out.cls_loss))   # D2H sync (block_until_ready can
        return time.perf_counter() - t0   # return early through the tunnel)

    run(warmup)
    ta, tb = run(max(1, iters // 5)), run(iters)
    return batch_size * (iters - max(1, iters // 5)) / (tb - ta)


def _measure_step_scanned(model, use_ssl, use_cm, state, batch, args, rng,
                          iters: int = SCAN_ITERS, reps: int = SCAN_REPS,
                          batch_size: int = BATCH, timings: dict | None = None):
    """Device-bound throughput: SCAN_ITERS steps per dispatch
    (train.steps.make_repeat_step), timed over `reps` dispatches after one
    warm/compile dispatch.

    Synchronization is by MATERIALIZING a scalar that is data-dependent on
    the final step, not by ``jax.block_until_ready``: through the tunneled
    axon runtime, block_until_ready on an unfetched remote output can return
    before remote execution finishes (observed: a 128-step scan "completing"
    in 4.6 ms — 72 µs/step, beyond the chip's peak-FLOP bound), silently
    timing only dispatch enqueue.  A real D2H fetch both forces completion
    and surfaces deferred execution errors; finiteness is asserted so a
    poisoned/failed run can't report a throughput."""
    import jax
    import numpy as np

    from druglamp_tpu.train.steps import make_repeat_step

    repeat = make_repeat_step(model, use_ssl=use_ssl, use_cm=use_cm,
                              iters=iters)
    step0 = int(np.asarray(state.step))
    rng, k = jax.random.split(rng)
    t_c = time.perf_counter()
    state, cls_l = repeat(state, batch, k, *args)    # warm: compiles
    float(np.asarray(cls_l)[-1])                     # sync via D2H
    if timings is not None:                          # compile-vs-exec split
        timings["compile_s"] = time.perf_counter() - t_c

    def run(n):
        nonlocal state, rng, cls_l
        t0 = time.perf_counter()
        for _ in range(n):
            rng, k = jax.random.split(rng)
            state, cls_l = repeat(state, batch, k, *args)
        last = float(np.asarray(cls_l)[-1])          # sync via D2H
        if not math.isfinite(last):
            raise RuntimeError(f"scanned bench non-finite loss: {last}")
        return time.perf_counter() - t0

    # two-point measurement: the D2H fetch roundtrip (~100-150 ms tunneled)
    # cancels in the difference
    t_e = time.perf_counter()
    ta, tb = run(1), run(reps + 1)
    elapsed = tb - ta
    if timings is not None:
        timings["exec_s"] = time.perf_counter() - t_e
    if elapsed <= 0:
        # two-point timing inverted (observed r5: host contention during the
        # ta window made tb < ta by 21 s → a NEGATIVE throughput).  A bad
        # measurement must raise — gated() turns it into a skip — never
        # publish as a value.
        raise RuntimeError(
            f"two-point timing inverted (ta={ta:.2f}s, tb={tb:.2f}s) — "
            "host contention during measurement; rerun the tier")
    # decisive execution proof: the optimizer step counter must have
    # advanced by exactly iters steps per dispatch
    total = 1 + 1 + (reps + 1)
    steps_done = int(np.asarray(state.step)) - step0
    if steps_done != iters * total:
        raise RuntimeError(
            f"scanned bench executed {steps_done} steps, expected "
            f"{iters * total} — the scan did not run as dispatched")
    return batch_size * iters * reps / elapsed


def _e2e_embeddings(cfg, table):
    """(embeddings, store, label) for the e2e tier: the real frozen-embedding
    cache + device-resident store when the cache exists (advisor r2: the
    zeros path excludes the dominant input cost for the LLM models, so the
    input mode must be labelled).

    When the on-disk cache is absent (workspace resets wipe it), the
    production TRANSPORT is still measurable: the device store ships only
    int32 ordinals per batch and gathers embeddings from HBM, so throughput
    is independent of the embedding VALUES.  Back the store with zeros at
    the REAL per-entity token lengths (TableZeroEmbeddings — lengths come
    from the entity table, so attention masks are non-degenerate and the
    step's numerics stay finite) and label it ``zero-store`` — same bytes
    moved, same gathers, same step math as ``cache+store``.  Plain
    ``zeros`` (dense ~27 MB/batch H2D of zero arrays, the slowest path and
    not the production one) remains only as the over-HBM-budget fallback,
    mirroring the training CLI's own fallback."""
    from druglamp_tpu.data.cache import (EmbeddingCache, TableZeroEmbeddings,
                                         ZeroEmbeddings)
    from druglamp_tpu.data.device_store import DeviceEmbeddingStore

    if os.path.isdir(CACHE_ROOT):
        import ml_dtypes

        cache = EmbeddingCache(CACHE_ROOT, "human", 384, 640,
                               dtype=ml_dtypes.bfloat16)
        if all(cache.has_drug(o) for o in range(table.n_drug)) and \
           all(cache.has_prot(o) for o in range(table.n_prot)):
            store = DeviceEmbeddingStore.build(
                table, cache, max_drug_tokens=cfg.drug.max_nodes,
                max_prot_len=cfg.protein.max_resis + 2)
            if store is not None:
                return cache, store, "cache+store"
            return cache, None, "cache"
    zeros = TableZeroEmbeddings.from_table(
        table, 384, 640, max_prot_resis=cfg.protein.max_resis,
        max_drug_tokens=cfg.drug.max_nodes)
    store = DeviceEmbeddingStore.build(
        table, zeros, max_drug_tokens=cfg.drug.max_nodes,
        max_prot_len=cfg.protein.max_resis + 2)
    if store is not None:
        return zeros, store, "zero-store"
    return ZeroEmbeddings(384, 640), None, "zeros"


def _prefetch_e2e_inputs(cfg, rows: int):
    """Host-side inputs shared by BOTH e2e tiers (dataset featurization +
    embedding source/store) — pure 1-core host work with no device state, so
    it can be built on a daemon thread WHILE the ssl/full step tiers run
    (their wall time is dominated by device execution + cache-hit compile
    deserialization, during which the GIL is free).  Returns
    (ds, embeddings, store, input_label) or None when the CSV is absent."""
    from druglamp_tpu.data.dataset import DTIDataset

    csv = os.path.join(DATA_ROOT, "human", "random", "train.csv")
    if not os.path.exists(csv):
        return None
    ds = DTIDataset(DATA_ROOT, "human", "random", "train.csv",
                    max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
                    max_prot_resis=cfg.protein.max_resis, cutoff=rows)
    embeddings, store, input_label = _e2e_embeddings(cfg, ds.table)
    return ds, embeddings, store, input_label


def _measure_epoch_e2e(cfg, device_data: bool = False,
                       rows: int | None = None, prebuilt=None):
    """Wall-clock pairs/s for one epoch of the real pipeline (CSV → host
    featurization/assembly → compact → H2D → scan-driver train steps).
    Dataset featurization (one-time, amortized across a run) is excluded;
    the first epoch warms the scan compile via the persistent cache.

    ``device_data=True`` measures the device-resident-dataset mode
    (data/device_data.py): the dataset is uploaded once and each epoch ships
    only the (S, B) int32 index plan — the A/B partner for the host-pipeline
    number.  Requires the ordinal embedding store (LLM model); returns
    (None, reason) when unsupported.

    ``prebuilt`` = a ``_prefetch_e2e_inputs`` result built concurrently with
    earlier tiers (r5: the feat phase is ~1/3 of the tier's warm wall)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_epoch_step

    t_feat = time.monotonic()
    built = prebuilt if prebuilt is not None else \
        _prefetch_e2e_inputs(cfg, rows or E2E_ROWS)
    if built is None:
        return None, None
    ds, embeddings, store, input_label = built
    print(f"[bench] e2e{'_dd' if device_data else ''} phases: "
          f"feat {time.monotonic() - t_feat:.1f}s"
          f"{' (prefetched)' if prebuilt is not None else ''}", flush=True)
    loader = BatchLoader(ds, BATCH, shuffle=True, drop_last=True,
                         embeddings=embeddings, seed=0,
                         include_llm=True, compact=True,
                         emb_ordinals=store is not None)
    store_tree = store.tree if store is not None else None
    if device_data:
        return _measure_epoch_e2e_device_data(cfg, ds, loader, store_tree,
                                              input_label)

    def shard(b):
        b = jax.tree.map(jnp.asarray, b)
        if store_tree is not None:
            b["_store"] = store_tree
        return b

    model = build_model("DrugLAMP", cfg)
    from druglamp_tpu.data.encoding import decode_batch

    example = shard(next(iter(loader.stacked_epoch(0, cfg.solver.scan_chunk))))

    def init_fn(ex, store):  # one jitted program (eager init ≈ 4 min tunneled)
        ex_one = decode_batch(jax.tree.map(lambda x: x[0], ex), store=store)
        return model.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          ex_one, jax.random.key(2), method="init_all")

    t_init = time.monotonic()
    variables = jax.jit(init_fn)(
        {k: v for k, v in example.items() if k != "_store"}, store_tree)
    jax.block_until_ready(variables)
    print(f"[bench] e2e phases: init {time.monotonic() - t_init:.1f}s",
          flush=True)
    epoch_fn = make_epoch_step(model, use_ssl=False, use_cm=False)
    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))

    def run_epoch(ep):
        state = TrainState.create(
            jax.tree.map(jnp.copy, variables), use_ssl=False, use_cm=False)
        rng = jax.random.key(4)
        n = 0
        t0 = time.perf_counter()
        out = None
        for stacked in loader.stacked_epoch(ep, cfg.solver.scan_chunk):
            n += int(stacked["labels"].shape[0]) * BATCH
            out = epoch_fn(state, shard(stacked), rng, *args)
            state, rng = out.state, out.rng
        if out is None:   # advisor r4: empty epoch (tiny dataset + drop_last)
            raise RuntimeError(
                f"e2e epoch produced no chunks (rows={rows or E2E_ROWS}, "
                f"batch={BATCH}, drop_last) — dataset too small to measure")
        # D2H fetch = sync + proof of execution; finiteness guard so an
        # all-pad/NaN-poisoned epoch can never report a throughput
        last = float(np.asarray(out.cls_losses)[-1])
        if not math.isfinite(last):
            raise RuntimeError(f"e2e epoch non-finite loss: {last}")
        return n / (time.perf_counter() - t0)

    t_w = time.monotonic()
    run_epoch(0)           # warm: compiles (persistent-cache backed)
    t_m = time.monotonic()
    pps = run_epoch(1)
    print(f"[bench] e2e phases: warm-epoch {t_m - t_w:.1f}s "
          f"measured-epoch {time.monotonic() - t_m:.1f}s", flush=True)
    return pps, input_label


def _measure_epoch_e2e_device_data(cfg, ds, loader, store_tree, input_label):
    """Device-resident-dataset epoch: gather batches from HBM by index
    (train.steps.make_epoch_step_gather).  Same rows, same batch order, same
    step math as the host-pipeline e2e tier — only the transport differs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from druglamp_tpu.data.device_data import (DeviceDataStore,
                                               train_index_plan)
    from druglamp_tpu.data.encoding import decode_batch
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_epoch_step_gather

    if not DeviceDataStore.supports(loader):
        return None, f"unsupported ({input_label})"
    t_store = time.monotonic()
    dd = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                               cfg.protein.seq_len,
                               include_llm=loader.include_llm,
                               emb_ordinals=loader.emb_ordinals)
    tree = dd.tree_for(ds)
    print(f"[bench] e2e_dd phases: store {time.monotonic() - t_store:.1f}s",
          flush=True)

    model = build_model("DrugLAMP", cfg)

    def init_fn(b, store):  # one jitted program (eager init ≈ 4 min tunneled)
        ex = decode_batch(dict(b), store=store)
        return model.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          ex, jax.random.key(2), method="init_all")

    t_init = time.monotonic()
    variables = jax.jit(init_fn)(
        jax.tree.map(jnp.asarray, loader.first_batch()), store_tree)
    jax.block_until_ready(variables)
    print(f"[bench] e2e_dd phases: init {time.monotonic() - t_init:.1f}s",
          flush=True)
    epoch_fn = make_epoch_step_gather(model, use_ssl=False, use_cm=False,
                                      include_llm=loader.include_llm,
                                      emb_ordinals=loader.emb_ordinals)
    args = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
            jnp.float32(0.5), jnp.float32(1.0))
    chunk = cfg.solver.scan_chunk

    def run_epoch(ep):
        state = TrainState.create(
            jax.tree.map(jnp.copy, variables), use_ssl=False, use_cm=False)
        rng = jax.random.key(4)
        idx = train_index_plan(loader._order(ep), BATCH)
        ones = np.ones(idx.shape, np.float32)
        n = idx.size
        t0 = time.perf_counter()
        out = None
        for s in range(0, idx.shape[0], chunk):
            out = epoch_fn(state, jnp.asarray(idx[s : s + chunk]),
                           jnp.asarray(ones[s : s + chunk]), tree,
                           store_tree, rng, *args)
            state, rng = out.state, out.rng
        if out is None:   # advisor r4: empty epoch (dataset < one batch)
            raise RuntimeError(
                f"e2e-dd epoch produced no chunks ({idx.shape[0]} batches "
                f"of {BATCH}) — dataset too small to measure")
        last = float(np.asarray(out.cls_losses)[-1])  # D2H sync + proof
        if not math.isfinite(last):
            raise RuntimeError(f"e2e-dd epoch non-finite loss: {last}")
        return n / (time.perf_counter() - t0)

    t_w = time.monotonic()
    run_epoch(0)           # warm: compiles
    t_m = time.monotonic()
    pps = run_epoch(1)
    print(f"[bench] e2e_dd phases: warm-epoch {t_m - t_w:.1f}s "
          f"measured-epoch {time.monotonic() - t_m:.1f}s", flush=True)
    return pps, input_label


def _result_json(cls_pps, tiers, skipped, elapsed_s, partial, salvaged=()):
    """One full-schema JSON line; unmeasured tiers are null.

    Numeric tier checks use ``is not None`` (advisor r4: a legitimate 0.0
    must not be reported as null — even though 0.0 pairs/s can't really
    occur, a falsy check is the wrong semantics)."""
    tflops = cls_pps * TRAIN_GFLOP_PER_PAIR / 1e3
    mfu = tflops / V5E_BF16_PEAK_TFLOPS
    if mfu > 1.0:
        # physically impossible — the chip cannot exceed its peak-FLOP rate;
        # any such reading is a synchronization/measurement artifact and must
        # never be published as a result
        raise RuntimeError(
            f"measured {tflops:.0f} TF/s exceeds the {V5E_BF16_PEAK_TFLOPS} "
            f"TF/s bf16 peak (mfu={mfu:.2f}) — timing did not capture real "
            "device execution")

    def _mfu(pps, gflop):
        return round(pps * gflop / 1e3 / V5E_BF16_PEAK_TFLOPS, 3) \
            if pps is not None else None

    ssl_pps = tiers.get("ssl")
    full_pps = tiers.get("full")
    bs64_pps = tiers.get("bs64")
    e2e = tiers.get("e2e")
    e2e_dd = tiers.get("e2e_dd")
    return json.dumps({
        "metric": "train_pairs_per_sec_per_chip",
        "value": round(cls_pps, 2),
        "unit": "pairs/s",
        "vs_baseline": round(cls_pps / A100_BASELINE_PAIRS_PER_SEC, 3),
        "vs_baseline_band": [round(cls_pps / A100_BASELINE_BAND[1], 2),
                             round(cls_pps / A100_BASELINE_BAND[0], 2)],
        "tflops_per_sec": round(tflops, 1),
        "mfu": round(mfu, 3),
        "ssl_step_pairs_per_sec": round(ssl_pps, 2)
        if ssl_pps is not None else None,
        "mfu_ssl": _mfu(ssl_pps, SSL_GFLOP_PER_PAIR),
        "full_step_pairs_per_sec": round(full_pps, 2)
        if full_pps is not None else None,
        "mfu_full": _mfu(full_pps, FULL_GFLOP_PER_PAIR),
        "cls_bs64_pairs_per_sec": round(bs64_pps, 2)
        if bs64_pps is not None else None,
        "mfu_bs64": _mfu(bs64_pps, TRAIN_GFLOP_PER_PAIR),
        "per_dispatch_pairs_per_sec": round(tiers["dispatch"], 2)
        if tiers.get("dispatch") is not None else None,
        "scan_iters": SCAN_ITERS,
        "epoch_e2e_pairs_per_sec": round(e2e[0], 2)
        if e2e is not None and e2e[0] is not None else None,
        "epoch_e2e_input": e2e[1] if e2e is not None else None,
        "epoch_e2e_dd_pairs_per_sec": round(e2e_dd[0], 2)
        if e2e_dd is not None and e2e_dd[0] is not None else None,
        "epoch_e2e_dd_input": e2e_dd[1] if e2e_dd is not None else None,
        "skipped": sorted(skipped),
        "salvaged": sorted(salvaged),
        "elapsed_s": round(elapsed_s, 1),
        "budget_s": BUDGET_S,
        "partial": partial,
        "baseline_derivation": "BASELINE.md#a100-baseline-derivation",
    })


SALVAGE_ROWS = 256       # e2e salvage slice; multiple of scan_chunk·batch so
                         # the reduced run reuses the full run's compiled scan


def main() -> None:
    t_start = time.monotonic()

    def left():
        return BUDGET_S - (time.monotonic() - t_start)

    import jax

    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()

    from druglamp_tpu.config import Config

    cfg = Config()

    # ---- preamble overlap ---------------------------------------------------
    # The dominant fixed cost in a fresh process is the tunnel attach: the
    # FIRST device roundtrip takes 265-420 s through the axon relay (probe,
    # r5) regardless of payload.  Pay it on a background thread while the
    # main thread does the e2e tiers' host featurization (~45-60 s of pure
    # numpy), so the feat phase rides inside the attach window instead of
    # competing with tier timing later (r5 warm2: a prefetch thread racing
    # the ssl tier slowed it 59→92 s and inverted the two-point timing).
    import threading

    import numpy as np

    hs_err: list = []

    def _handshake():
        try:
            np.asarray(jax.device_put(np.float32(0.0)))   # full H2D+D2H attach
        except Exception as e:   # surfaced by the first real tier instead
            hs_err.append(e)

    hs = threading.Thread(target=_handshake, name="tunnel-attach")
    hs.start()
    _pf = {"out": None, "err": None}
    try:
        _pf["out"] = _prefetch_e2e_inputs(cfg, E2E_ROWS)
    except Exception as e:
        _pf["err"] = e
    hs.join()
    print(f"[bench] attach+prefetch done at {time.monotonic() - t_start:.1f}s"
          f" (prefetch {'ok' if _pf['err'] is None else repr(_pf['err'])})",
          flush=True)

    # ---- headline tier first: DrugLAMP cls step, scanned -------------------
    # Three phases timed separately (r4 postmortem: the driver's cold
    # headline took 388 s, and estimates that scaled the WHOLE headline cost
    # — compile included — then predicted 466-622 s for tiers whose warm cost
    # is 30-90 s, skipping everything):
    #   setup_s    make_tier — batch build + jitted param init (compiles)
    #   compile_s  first repeat-step dispatch (scan compile / cache load)
    #   exec_s     the steady-state measurement itself
    t0 = time.monotonic()
    _, state, batch, args, model = make_tier("DrugLAMP", use_ssl=False,
                                             use_cm=False, cfg=cfg)
    setup_s = time.monotonic() - t0
    tm: dict = {}
    cls_pps = _measure_step_scanned(model, False, False, state, batch, args,
                                    jax.random.key(5), timings=tm)
    compile_s = tm.get("compile_s", 0.0)
    exec_s = tm.get("exec_s", 0.0)
    tiers, skipped, salvaged = {}, [], []
    print(_result_json(cls_pps, tiers, ["pending"],
                       time.monotonic() - t_start, partial=True), flush=True)
    # preamble = import jax + backend/tunnel handshake + everything the
    # three phases don't cover — one-time per process, never recurs per-tier
    print(f"[bench] headline phases: preamble "
          f"{time.monotonic() - t_start - setup_s - compile_s - exec_s:.1f}s "
          f"setup {setup_s:.1f}s compile {compile_s:.1f}s exec {exec_s:.1f}s "
          f"(left {left():.0f}s)", flush=True)

    # ---- remaining tiers, budget-gated --------------------------------------
    # Per-tier cost = setup·s_mult + compile·c_mult + exec·e_mult, estimated
    # from the headline's measured PHASES: compile cost reflects the
    # persistent-cache state (warm: seconds; cold: minutes), exec scales with
    # the tier's audited FLOPs (tools/flop_audit.py), setup with program
    # size.  A tier that doesn't fit tries its SALVAGE variant (reduced
    # measurement reps / shorter e2e slice — same compiled programs) before
    # being skipped.  Multipliers calibrated against the r4 warm/cold runs
    # (docs/artifacts/bench_r4_{warm,coldcache}.log) + the r5 instrumented
    # run (docs/artifacts/bench_r5_phases.log).
    SAFETY = 1.2

    def gated(name, est, fn, salvage_fn=None, salvage_est=None):
        est *= SAFETY
        if left() >= est:
            run, is_salvage = fn, False
        elif salvage_fn is not None and left() >= salvage_est * SAFETY:
            run, is_salvage = salvage_fn, True
        else:
            skipped.append(f"{name} (est {est:.0f}s > left {left():.0f}s)")
            return None
        t0 = time.monotonic()
        try:
            out = run()
        except Exception as e:   # a bad tier env must not kill the artifact
            print(f"[bench] {name} failed: {e!r}", flush=True)
            skipped.append(f"{name} (error)")
            return None
        if is_salvage:
            salvaged.append(name)
        print(f"[bench] tier {name}{' (salvage)' if is_salvage else ''} "
              f"took {time.monotonic() - t0:.1f}s", flush=True)
        return out

    def step_tier(model_name, use_ssl, use_cm, reps=SCAN_REPS):
        _, state, batch, args, model = make_tier(model_name, use_ssl=use_ssl,
                                                 use_cm=use_cm, cfg=cfg)
        return _measure_step_scanned(model, use_ssl, use_cm, state, batch,
                                     args, jax.random.key(5), reps=reps)

    def ssl_tier(reps=SCAN_REPS):
        return step_tier("DrugLAMP", True, False, reps=reps)

    def full_tier(reps=SCAN_REPS):
        return step_tier("DrugLAMP2C2P", True, True, reps=reps)

    # exec multipliers = audited per-pair FLOP ratios vs the cls tier
    ssl_x = SSL_GFLOP_PER_PAIR / TRAIN_GFLOP_PER_PAIR     # ≈ 2.16
    full_x = FULL_GFLOP_PER_PAIR / TRAIN_GFLOP_PER_PAIR   # ≈ 3.0
    # Step-tier cost model recalibrated against 4 measured points (r5):
    # ssl took 130.6 s cold / 119.6 s warm, full 132.1 s cold — nearly
    # CONSTANT regardless of the headline's compile phase (a tier's own
    # programs pay deserialization + incremental compile, not a multiple
    # of the headline compile).  The old compile_s×1.5–2.0 terms
    # over-estimated 2–3× and skipped `full` with 150 s of budget unused
    # (bench_r5_warm2.log).  Model: setup (scales with program size) +
    # ~65–75 s tier compile/deserialize + FLOP-scaled exec.
    est_ssl = setup_s * 1.0 + 65.0 + exec_s * ssl_x
    est_full = setup_s * 1.1 + 75.0 + exec_s * full_x
    # salvage: same compiled scan, reps=1 → exec ≈ 4/7 of the full 7-dispatch
    # measurement (warm + 1 + reps+1); compile/setup are irreducible
    sal_ssl = setup_s * 1.0 + 65.0 + exec_s * ssl_x * 0.6
    sal_full = setup_s * 1.1 + 75.0 + exec_s * full_x * 0.6
    # e2e tiers reuse the host inputs prefetched during the tunnel attach
    # (top of main); on prefetch failure they fall back to the inline build
    def e2e_prebuilt():
        if _pf["err"] is not None:
            print(f"[bench] e2e prefetch failed: {_pf['err']!r}", flush=True)
            return None
        return _pf["out"]

    pf_ok = _pf["err"] is None and _pf["out"] is not None

    # Warm-floor cost model (calibrated: bench_r5_prime.log cold = headline
    # compile 67 s, e2e_dd 223 s, e2e 157 s; bench_r5_warm.log warm =
    # headline compile 13 s, e2e_dd 154 s).  The tier's epoch-program
    # cache-hit deserialization does NOT scale with the headline's compile_s
    # — a warm cache still pays tens of seconds per distinct program through
    # the tunnel — so estimates are warm floors plus a cold surcharge keyed
    # on the headline's own compile phase, minus the prefetched feat part.
    # Threshold between warm and cold headline compiles: a warm .jax_cache
    # still pays cache-hit deserialization through the tunnel — measured
    # 49.6 s under host contention (bench_r5_warm2.log) vs 92.7 s truly
    # cold (bench_r5_prime.log) — so 30 s misclassified a warm run as cold
    # and inflated every remaining tier's estimate (the r5 warm validation
    # skipped `full` with 150 s of budget left unused).
    cold = compile_s > 70.0
    feat_unit = 45.0 * E2E_ROWS / 1024.0
    sal_feat = 45.0 * SALVAGE_ROWS / 1024.0

    def e2e_est(warm_floor, cold_extra):
        """(full_est, salvage_est).  warm_floor includes feat @E2E_ROWS; the
        full variant drops it when the prefetch already paid it; salvage
        rebuilds inline at SALVAGE_ROWS.  The non-feat remainder is almost
        entirely store-build + jitted-init + warm-epoch compile (the
        measured epoch itself is ~2 s at 582 pairs/s), so salvage saves
        little more than feat — it exists for the prefetch-failed case."""
        extra = cold_extra if cold else 0.0
        full = warm_floor - (feat_unit if pf_ok else 0.0) + extra
        # salvage at SALVAGE_ROWS: feat scales with rows; store-build and
        # the measured epoch shrink ~proportionally too (only init/compile
        # are fixed) — model the non-feat remainder at 0.8×
        sal = (warm_floor - feat_unit) * 0.8 + sal_feat + extra
        return full, sal

    # tier order = information value (VERDICT r4 #1 done-criterion: the
    # artifact needs non-null ssl_step, full_step, AND ≥1 epoch tier — so
    # the two step tiers come first (cheapest per bit of novelty: their
    # MFUs have never appeared in a driver artifact), then the dd epoch
    # (production transport), then the host-pipeline e2e (least novel A/B
    # partner; its tier is also the one the r5 prime run showed cheapest
    # to re-derive offline).
    tiers["ssl"] = gated("ssl", est_ssl, ssl_tier,
                         lambda: ssl_tier(reps=1), sal_ssl)
    _after_ssl = _result_json(cls_pps, tiers, skipped + ["pending"],
                              time.monotonic() - t_start, partial=True,
                              salvaged=salvaged)
    print(_after_ssl, flush=True)
    tiers["full"] = gated("full", est_full, full_tier,
                          lambda: full_tier(reps=1), sal_full)
    print(_result_json(cls_pps, tiers, skipped + ["pending"],
                       time.monotonic() - t_start, partial=True,
                       salvaged=salvaged), flush=True)
    dd_full_est, dd_sal_est = e2e_est(160.0, 70.0)
    tiers["e2e_dd"] = gated(
        "e2e_dd", dd_full_est,
        lambda: _measure_epoch_e2e(cfg, device_data=True,
                                   prebuilt=e2e_prebuilt()),
        lambda: _measure_epoch_e2e(cfg, device_data=True, rows=SALVAGE_ROWS),
        dd_sal_est)
    print(_result_json(cls_pps, tiers, skipped + ["pending"],
                       time.monotonic() - t_start, partial=True,
                       salvaged=salvaged), flush=True)
    h_full_est, h_sal_est = e2e_est(110.0, 45.0)
    tiers["e2e"] = gated(
        "e2e", h_full_est,
        lambda: _measure_epoch_e2e(cfg, prebuilt=e2e_prebuilt()),
        lambda: _measure_epoch_e2e(cfg, rows=SALVAGE_ROWS),
        h_sal_est)

    if EXTRA_TIERS:
        def bs64_tier():
            _, state, batch, args, model = make_tier(
                "DrugLAMP", use_ssl=False, use_cm=False, cfg=cfg,
                batch_size=64)
            return _measure_step_scanned(model, False, False, state, batch,
                                         args, jax.random.key(5),
                                         iters=max(8, SCAN_ITERS // 4),
                                         batch_size=64)

        def dispatch_tier():
            step, state, batch, args, _ = make_tier("DrugLAMP", use_ssl=False,
                                                    use_cm=False, cfg=cfg)
            return _measure_step(step, state, batch, args, jax.random.key(3))

        tiers["bs64"] = gated("bs64", setup_s + compile_s * 2 + exec_s, bs64_tier)
        tiers["dispatch"] = gated("dispatch", setup_s + exec_s * 3,
                                  dispatch_tier)

    print(_result_json(cls_pps, tiers, skipped,
                       time.monotonic() - t_start, partial=False,
                       salvaged=salvaged), flush=True)


if __name__ == "__main__":
    main()
