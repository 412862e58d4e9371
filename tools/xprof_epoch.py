"""Per-fusion device-time attribution of the device-data (gather) epoch.

VERDICT r4 #7: dd epochs run at 582-976 pairs/s vs the 1795 pairs/s step
rate.  With scan_chunk=64 the whole 1024-row epoch is ONE dispatch, so the
gap is either on-device (embedding-store gather + decode making scanned
steps slower) or fixed per-epoch host/tunnel cost.  This traces epoch 1 of
the exact bench tier (`bench._measure_epoch_e2e(device_data=True)`) and
prints the same per-fusion table as tools/xprof_step.py, plus wall-clock
phases so on-device vs off-device time is explicit.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/xprof_epoch.py
"""

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--logdir", default="/tmp/xprof_epoch")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from druglamp_tpu.config import Config
    from druglamp_tpu.data.device_data import DeviceDataStore, train_index_plan
    from druglamp_tpu.data.encoding import decode_batch
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_epoch_step_gather
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    t0 = time.time()
    built = bench._prefetch_e2e_inputs(cfg, args.rows)
    ds, embeddings, store, input_label = built
    loader = BatchLoader(ds, bench.BATCH, shuffle=True, drop_last=True,
                         embeddings=embeddings, seed=0, include_llm=True,
                         compact=True, emb_ordinals=store is not None)
    store_tree = store.tree if store is not None else None
    print(f"[xprof-e] inputs built ({time.time() - t0:.0f}s, {input_label})",
          flush=True)
    dd = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                               cfg.protein.seq_len,
                               include_llm=loader.include_llm,
                               emb_ordinals=loader.emb_ordinals)
    tree = dd.tree_for(ds)
    model = build_model("DrugLAMP", cfg)

    def init_fn(b, store_t):
        ex = decode_batch(dict(b), store=store_t)
        return model.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          ex, jax.random.key(2), method="init_all")

    variables = jax.jit(init_fn)(
        jax.tree.map(jnp.asarray, loader.first_batch()), store_tree)
    jax.block_until_ready(variables)
    print(f"[xprof-e] init done ({time.time() - t0:.0f}s)", flush=True)
    epoch_fn = make_epoch_step_gather(model, use_ssl=False, use_cm=False,
                                      include_llm=loader.include_llm,
                                      emb_ordinals=loader.emb_ordinals)
    sargs = (jnp.float32(1e-4), jnp.float32(3e-5), jnp.float32(1e-5),
             jnp.float32(0.5), jnp.float32(1.0))
    chunk = cfg.solver.scan_chunk

    if os.environ.get("XPROF_EPOCH_HLO", "0") == "1":
        # save the optimized HLO (compile is a cache hit after a first run)
        state0 = TrainState.create(jax.tree.map(jnp.copy, variables),
                                   use_ssl=False, use_cm=False)
        idx0 = train_index_plan(loader._order(0), bench.BATCH)[:chunk]
        ones0 = np.ones(idx0.shape, np.float32)
        low = jax.jit(epoch_fn).lower(state0, jnp.asarray(idx0),
                                      jnp.asarray(ones0), tree, store_tree,
                                      jax.random.key(4), *sargs)
        os.makedirs(args.logdir, exist_ok=True)
        with open(os.path.join(args.logdir, "hlo.txt"), "w") as f:
            f.write(low.compile().as_text())
        print("[xprof-e] hlo saved", flush=True)

    def run_epoch(ep, phases=None):
        state = TrainState.create(jax.tree.map(jnp.copy, variables),
                                  use_ssl=False, use_cm=False)
        rng = jax.random.key(4)
        t_h = time.perf_counter()
        idx = train_index_plan(loader._order(ep), bench.BATCH)
        ones = np.ones(idx.shape, np.float32)
        out = None
        t_d = time.perf_counter()
        n_disp = 0
        for s in range(0, idx.shape[0], chunk):
            out = epoch_fn(state, jnp.asarray(idx[s:s + chunk]),
                           jnp.asarray(ones[s:s + chunk]), tree,
                           store_tree, rng, *sargs)
            state, rng = out.state, out.rng
            n_disp += 1
        t_q = time.perf_counter()
        last = float(np.asarray(out.cls_losses)[-1])
        assert np.isfinite(last)
        t_f = time.perf_counter()
        if phases is not None:
            phases.update(host_plan=t_d - t_h, enqueue=t_q - t_d,
                          fetch_wait=t_f - t_q, total=t_f - t_h,
                          n_dispatch=n_disp)
        return idx.size / (t_f - t_h)

    run_epoch(0)   # warm/compile
    ph: dict = {}
    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        pps = run_epoch(1, ph)
    print(f"[xprof-e] epoch1 {pps:.0f} pairs/s  phases: "
          f"host_plan {ph['host_plan'] * 1e3:.0f}ms enqueue "
          f"{ph['enqueue'] * 1e3:.0f}ms fetch_wait {ph['fetch_wait'] * 1e3:.0f}ms "
          f"({ph['n_dispatch']} dispatches, rows={args.rows})", flush=True)

    paths = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit("no xplane.pb produced")
    from jax.profiler import ProfileData

    data = ProfileData.from_file(paths[-1])
    per_op = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    if not per_op:
        raise SystemExit("no device-plane events")
    total_ns = sum(per_op.values())
    steps = args.rows // bench.BATCH
    print(f"\n[xprof-e] device total {total_ns / 1e6:.2f} ms "
          f"({steps} steps -> {total_ns / 1e6 / steps:.3f} ms/step; "
          f"wall epoch {ph['total'] * 1e3:.0f} ms)")
    print(f"{'op':64s} {'tot ms':>8s} {'%':>5s}")
    for name, ns in per_op.most_common(args.top):
        print(f"{name[:64]:64s} {ns / 1e6:8.2f} {100 * ns / total_ns:5.1f}")


if __name__ == "__main__":
    main()
