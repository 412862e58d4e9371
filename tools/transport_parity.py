"""Cross-transport determinism probe (round-3 verdict weak #4).

Round 3 observed ~0.02 AUROC spread between the host epoch-in-scan transport
(train.steps.make_epoch_step over stacked host batches) and the
device-resident-dataset transport (make_epoch_step_gather over HBM gathers)
on biosnap/cluster seed 42, despite bit-identical batch composition
(tests/test_device_data.py::test_gather_matches_loader).  This tool answers
WHERE the divergence enters with three A/B trajectory comparisons on
identical data, identical rng threading (the trainer's per-epoch
fold_in(key(seed+777), epoch)), identical batch order:

  granularity  device-data with chunk=whole-epoch vs chunk=scan_chunk —
               does dispatch granularity alone change the trajectory?
               (trainer._dd_chunk docstring claims it cannot: rng and
               cm_weight thread through the scan carry)
  transport    host make_epoch_step vs dd make_epoch_step_gather — do the
               two PROGRAMS produce bitwise-identical parameter updates?
  repeat       dd run twice — per-program determinism control.

Each comparison prints one JSON line with the max |Δparam| after the first
epoch and after all epochs plus a bitwise-equal flag.  Interpretation: if
`repeat` and `granularity` are bitwise but `transport` is not, the
cross-transport spread is an irreducible program-identity effect (XLA fuses
the two different input paths differently → different fp rounding →
chaotic divergence over a training run), not a data or rng bug — per-run
determinism still holds for each transport separately.

Usage:  python tools/transport_parity.py [--epochs 3] [--full-shapes]
        (runs on whatever backend JAX selects; JAX_PLATFORMS=cpu for the
        deterministic-backend variant)
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_toy_root(tmpdir: str, n: int = 48) -> str:
    smis = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1", "c1ccncc1",
            "CC(C)CC(=O)O", "c1ccc2ccccc2c1"]
    prots = ["MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ",
             "MSEQNNTEMTFQIQRIYTKDIS",
             "MAHHHHHHVGTGSNG",
             "MKVLAAGITGLLLLAAGGSHA"]
    d = os.path.join(tmpdir, "toy", "random")
    os.makedirs(d, exist_ok=True)
    rng = __import__("numpy").random.RandomState(7)
    with open(os.path.join(d, "train.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["SMILES", "Protein", "Y"])
        w.writeheader()
        for i in range(n):
            w.writerow({"SMILES": smis[i % len(smis)],
                        "Protein": prots[i % len(prots)],
                        "Y": int(rng.rand() < 0.5)})
    return tmpdir


class RandEmb:
    """Seeded random per-ordinal embeddings (stands in for the frozen cache)."""

    def __init__(self, n_drug_feature: int, n_prot_feature: int):
        import numpy as np

        self.n_drug_feature = n_drug_feature
        self.n_prot_feature = n_prot_feature
        self._np = np

    def drug(self, o):
        import ml_dtypes

        return self._np.random.RandomState(o).randn(
            8, self.n_drug_feature).astype(ml_dtypes.bfloat16)

    def prot(self, o):
        import ml_dtypes

        return self._np.random.RandomState(50 + o).randn(
            13, self.n_prot_feature).astype(ml_dtypes.bfloat16)


def run(epochs: int = 3, full_shapes: bool = False, batch: int = 8,
        out=print):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from druglamp_tpu.config import Config
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.device_data import DeviceDataStore, train_index_plan
    from druglamp_tpu.data.device_store import DeviceEmbeddingStore
    from druglamp_tpu.data.encoding import decode_batch
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_epoch_step, make_epoch_step_gather

    from druglamp_tpu.config import SolverConfig

    # float32 end to end: bf16 would mask sub-ulp program differences
    if full_shapes:
        cfg = Config(solver=SolverConfig(compute_dtype="float32"))
        nd, npf = 384, 640
    else:
        from druglamp_tpu.utils.synthetic import tiny_config

        cfg = tiny_config(solver=SolverConfig(compute_dtype="float32"))
        nd, npf = 24, 40

    tmpdir = tempfile.mkdtemp(prefix="transport_parity_")
    root = make_toy_root(tmpdir)
    ds = DTIDataset(root, "toy", "random", "train.csv",
                    max_nodes=cfg.drug.max_nodes,
                    seq_len=cfg.protein.seq_len,
                    max_prot_resis=cfg.protein.max_resis)
    emb = RandEmb(nd, npf)
    emb_store = DeviceEmbeddingStore.build(
        ds.table, emb, max_drug_tokens=cfg.drug.max_nodes,
        max_prot_len=cfg.protein.max_resis + 2).tree
    loader = BatchLoader(ds, batch, shuffle=True, drop_last=True, prefetch=0,
                         embeddings=emb, include_llm=True, compact=True,
                         emb_ordinals=True, seed=42)
    dd = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                               cfg.protein.seq_len,
                               include_llm=True, emb_ordinals=True)
    tree = dd.tree_for(ds)

    model = build_model("DrugLAMP", cfg, nd, npf)
    ex = decode_batch(jax.tree.map(jnp.asarray, loader.first_batch()),
                      store=emb_store)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           ex, jax.random.key(2), method="init_all")
    args = (jnp.float32(1e-3), jnp.float32(3e-4), jnp.float32(1e-4),
            jnp.float32(0.5), jnp.float32(1.0))
    ep_host = make_epoch_step(model, use_ssl=False, use_cm=False)
    ep_dd = make_epoch_step_gather(model, use_ssl=False, use_cm=False,
                                   include_llm=True, emb_ordinals=True)

    def mkstate():
        return TrainState.create(jax.tree.map(jnp.copy, variables),
                                 use_ssl=False, use_cm=False)

    def epoch_rng(epoch):
        return jax.random.fold_in(jax.random.key(42 + 777), epoch)

    def run_host(chunk):
        state, snaps = mkstate(), []
        for epoch in range(1, epochs + 1):
            rng = epoch_rng(epoch)
            for stacked in loader.stacked_epoch(epoch, chunk):
                b = jax.tree.map(jnp.asarray, stacked)
                b["_store"] = emb_store
                o = ep_host(state, b, rng, *args)
                state, rng = o.state, o.rng
            snaps.append(jax.tree.map(np.asarray, state.params))
        return snaps

    def run_dd(chunk):
        state, snaps = mkstate(), []
        for epoch in range(1, epochs + 1):
            rng = epoch_rng(epoch)
            idx = train_index_plan(loader._order(epoch), batch)
            ones = np.ones(idx.shape, np.float32)
            c = chunk if chunk > 0 else idx.shape[0]
            for s in range(0, idx.shape[0], c):
                o = ep_dd(state, jnp.asarray(idx[s:s + c]),
                          jnp.asarray(ones[s:s + c]), tree, emb_store,
                          rng, *args)
                state, rng = o.state, o.rng
            snaps.append(jax.tree.map(np.asarray, state.params))
        return snaps

    def compare(name, a, b):
        def maxdiff(x, y):
            return max(float(np.max(np.abs(np.asarray(u, np.float32)
                                           - np.asarray(v, np.float32))))
                       for u, v in zip(jax.tree.leaves(x), jax.tree.leaves(y)))

        bitwise = all(np.array_equal(np.asarray(u), np.asarray(v))
                      for u, v in zip(jax.tree.leaves(a[-1]),
                                      jax.tree.leaves(b[-1])))
        out(json.dumps({
            "comparison": name,
            "epochs": epochs,
            "max_abs_dparam_epoch1": maxdiff(a[0], b[0]),
            "max_abs_dparam_final": maxdiff(a[-1], b[-1]),
            "bitwise_equal_final": bitwise,
            "backend": jax.default_backend(),
        }))
        return bitwise

    chunk = max(1, cfg.solver.scan_chunk)
    dd_whole = run_dd(0)
    results = {
        "granularity": compare("granularity (dd whole-epoch vs dd chunked)",
                               dd_whole, run_dd(chunk)),
        "transport": compare("transport (host scan vs dd gather)",
                             run_host(chunk), dd_whole),
        "repeat": compare("repeat (dd twice)", dd_whole, run_dd(0)),
    }
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--full-shapes", action="store_true")
    a = p.parse_args()
    run(epochs=a.epochs, full_shapes=a.full_shapes, batch=a.batch)
