"""Host-RSS leak probe for long training runs.

Round 2's sweep processes were OOM-killed at ~130 GB anon RSS (rc=137 in
logs/queue_r2.status; confirmed via dmesg oom-kill records), and a surviving
in-process 2-seed sweep reached 83 GB — something retains host memory per
epoch.  This probe runs the real Trainer loop (same code path as cli.main)
for N epochs on a cutoff dataset and prints RSS + optional tracemalloc top
allocations every epoch, so the growth source can be bisected by flag:

    python tools/leak_probe.py --epochs 30 --cutoff 512 [--model DrugLAMPwoLLM]
        [--scan-chunk 64|0] [--no-eval] [--no-ckpt] [--tracemalloc]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1048576.0
    return 0.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="DrugLAMPwoLLM")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--cutoff", type=int, default=512)
    p.add_argument("--scan-chunk", type=int, default=64)
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--no-ckpt", action="store_true")
    p.add_argument("--tracemalloc", action="store_true")
    p.add_argument("--trim", action="store_true",
                   help="call glibc malloc_trim(0) each epoch — if RSS stops "
                        "growing, the 'leak' is allocator free-list retention, "
                        "not live references")
    p.add_argument("--data-root", default="/root/reference/datasets")
    args = p.parse_args()

    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from druglamp_tpu.config import builtin_config_path, load_config
    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.trainer import Trainer

    if args.tracemalloc:
        import tracemalloc

        tracemalloc.start(10)

    cfg = load_config(builtin_config_path(args.model),
                      {"solver.scan_chunk": args.scan_chunk,
                       "solver.max_epoch": args.epochs})
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis, cutoff=args.cutoff)
    train_ds = DTIDataset(args.data_root, "human", "random", "train.csv", **kw)
    val_ds = DTIDataset(args.data_root, "human", "random", "val.csv",
                        table=train_ds.table, **kw)
    needs_llm = args.model != "DrugLAMPwoLLM"
    emb = ZeroEmbeddings(384, 640)
    train_loader = BatchLoader(train_ds, cfg.solver.batch_size, shuffle=True,
                               drop_last=True, embeddings=emb, seed=0,
                               include_llm=needs_llm, compact=True)
    val_loader = BatchLoader(val_ds, cfg.solver.eval_batch_size, shuffle=False,
                             drop_last=False, embeddings=emb,
                             include_llm=needs_llm, compact=True)
    model = build_model(args.model, cfg)
    import tempfile

    work = tempfile.mkdtemp(prefix="leak_probe_")
    trainer = Trainer(model, cfg, train_loader, val_loader, val_loader,
                      work_dir=work)
    state = trainer.init_state(train_loader.first_batch(), seed=42)

    rng0 = jax.random.key(123)
    snap = None
    print(f"[probe] start rss={rss_gb():.2f} GB", flush=True)
    for epoch in range(1, args.epochs + 1):
        rng = jax.random.fold_in(rng0, epoch)
        if trainer.scan_chunk > 1:
            state, *_ = trainer._fit_epoch_scan(
                state, epoch, rng, False, False, False, 1e-4, 3e-5, 1e-5, 0.5)
        else:
            state, *_ = trainer._fit_epoch_loop(
                state, epoch, rng, False, False, False, 1e-4, 3e-5, 1e-5, 0.5)
        if not args.no_eval:
            trainer.evaluate(state, val_loader, full=False)
        if not args.no_ckpt:
            trainer._save(os.path.join(work, "ckpt_last"), state)
        if args.trim:
            import ctypes

            ctypes.CDLL("libc.so.6").malloc_trim(0)
        line = f"[probe] epoch {epoch} rss={rss_gb():.2f} GB"
        if args.tracemalloc:
            import tracemalloc

            cur = tracemalloc.take_snapshot()
            if snap is not None and epoch % 5 == 0:
                top = cur.compare_to(snap, "lineno")[:6]
                for t in top:
                    line += f"\n    {t}"
            snap = cur
        print(line, flush=True)


if __name__ == "__main__":
    main()
