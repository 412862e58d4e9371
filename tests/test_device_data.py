"""Device-resident dataset (data/device_data): gather parity + trajectories.

The gather path must feed the jitted steps EXACTLY the batches BatchLoader
assembles on host — same packing, same CM ground truth, same tail padding —
so that turning it on changes transport only, never the trajectory.
"""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from druglamp_tpu.config import RSConfig, SolverConfig
from druglamp_tpu.data.dataset import DTIDataset
from druglamp_tpu.data.device_data import (DeviceDataStore, cm_arrays_device,
                                           eval_index_plan,
                                           gather_compact_batch,
                                           train_index_plan)
from druglamp_tpu.data.loader import BatchLoader, build_cm_arrays
from druglamp_tpu.models.registry import build_model
from druglamp_tpu.train.state import TrainState
from druglamp_tpu.train.trainer import Trainer
from tests.util import tiny_config


def _make_csv_dataset(tmp_path, n=24):
    smis = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1", "c1ccncc1"]
    prots = ["MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ",
             "MSEQNNTEMTFQIQRIYTKDIS",
             "MAHHHHHHVGTGSNG"]
    d = tmp_path / "toy" / "random"
    os.makedirs(d, exist_ok=True)
    rows = []
    r = np.random.RandomState(0)
    for i in range(n):
        rows.append({"SMILES": smis[i % len(smis)],
                     "Protein": prots[i % len(prots)],
                     "Y": int(r.rand() < 0.5)})
    for name, sl in [("train.csv", slice(0, n)), ("val.csv", slice(0, 10))]:
        with open(d / name, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["SMILES", "Protein", "Y"])
            w.writeheader()
            for row in rows[sl]:
                w.writerow(row)
    return str(tmp_path)


class _RandEmb:
    n_drug_feature, n_prot_feature = 24, 40

    def drug(self, o):
        import ml_dtypes

        return np.random.RandomState(o).randn(6, 24).astype(ml_dtypes.bfloat16)

    def prot(self, o):
        import ml_dtypes

        return (np.random.RandomState(50 + o).randn(11, 40)
                .astype(ml_dtypes.bfloat16))


def _emb_store(table, cfg, emb):
    from druglamp_tpu.data.device_store import DeviceEmbeddingStore

    return DeviceEmbeddingStore.build(
        table, emb, max_drug_tokens=cfg.drug.max_nodes,
        max_prot_len=cfg.protein.max_resis + 2).tree


def _dataset(root, cfg, fname="train.csv", table=None):
    return DTIDataset(root, "toy", "random", fname,
                      max_nodes=cfg.drug.max_nodes,
                      seq_len=cfg.protein.seq_len,
                      max_prot_resis=cfg.protein.max_resis, table=table)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cm_arrays_device_matches_host(seed):
    r = np.random.RandomState(seed)
    B = 8
    pid = r.randint(0, 3, size=B).astype(np.int32)   # forced duplicates
    did = r.randint(0, 5, size=B).astype(np.int32)
    labels = r.randint(0, 2, size=B).astype(np.float32)
    host = build_cm_arrays(pid, did, labels)
    dev = jax.tree.map(np.asarray,
                       cm_arrays_device(jnp.asarray(pid), jnp.asarray(did),
                                        jnp.asarray(labels)))
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k], host[k].dtype),
                                      host[k], err_msg=k)


def test_cm_arrays_device_edge_cases():
    # all-same protein, all-distinct drugs; and fully duplicated rows
    for pid, did in [(np.zeros(6, np.int32), np.arange(6, dtype=np.int32)),
                     (np.zeros(6, np.int32), np.zeros(6, np.int32)),
                     (np.arange(6, dtype=np.int32),
                      np.arange(6, dtype=np.int32))]:
        labels = (np.arange(6) % 2).astype(np.float32)
        host = build_cm_arrays(pid, did, labels)
        dev = jax.tree.map(np.asarray,
                           cm_arrays_device(jnp.asarray(pid), jnp.asarray(did),
                                            jnp.asarray(labels)))
        for k in host:
            np.testing.assert_array_equal(np.asarray(dev[k], host[k].dtype),
                                          host[k], err_msg=k)


@pytest.mark.parametrize("mode", ["wollm", "ordinals"])
def test_gather_matches_loader(tmp_path, mode):
    """Gathered batches are bit-identical to _assemble_compact on the same
    indices (the device-data mode changes transport, not content)."""
    cfg = tiny_config()
    root = _make_csv_dataset(tmp_path)
    ds = _dataset(root, cfg)
    include_llm = mode == "ordinals"
    loader = BatchLoader(ds, 4, shuffle=True, drop_last=True, prefetch=0,
                         include_llm=include_llm, compact=True,
                         emb_ordinals=include_llm)
    store = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                                  cfg.protein.seq_len,
                                  include_llm=include_llm,
                                  emb_ordinals=include_llm)
    tree = store.tree_for(ds)
    fake_emb_store = {"sentinel": jnp.zeros(())} if include_llm else None

    idx = train_index_plan(loader._order(3), 4)
    for row in idx:
        host = loader._assemble_compact(row.astype(np.int64))
        dev = gather_compact_batch(tree, jnp.asarray(row),
                                   jnp.ones(4, jnp.float32),
                                   include_llm, include_llm, fake_emb_store)
        dev = jax.tree.map(np.asarray, dev)
        assert set(host) == set(dev)
        for k in host:
            if k == "cm":
                for ck in host[k]:
                    np.testing.assert_array_equal(
                        np.asarray(dev[k][ck], host[k][ck].dtype),
                        host[k][ck], err_msg=f"cm.{ck}")
            else:
                np.testing.assert_array_equal(
                    np.asarray(dev[k], host[k].dtype), host[k], err_msg=k)


def test_eval_index_plan_matches_loader_tail(tmp_path):
    """The eval plan's tail padding replicates the loader's ragged-batch
    padding (repeat the tail batch's first row)."""
    cfg = tiny_config()
    root = _make_csv_dataset(tmp_path)
    ds = _dataset(root, cfg, "val.csv")     # 10 rows, bs 4 → tail of 2
    loader = BatchLoader(ds, 4, shuffle=False, drop_last=False, prefetch=0,
                         include_llm=False, compact=True)
    idx, valid = eval_index_plan(len(ds), 4)
    host_batches = list(loader.epoch(0))
    assert idx.shape[0] == len(host_batches)
    store = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                                  cfg.protein.seq_len,
                                  include_llm=False, emb_ordinals=False)
    tree = store.tree_for(ds)
    for s, host in enumerate(host_batches):
        dev = jax.tree.map(np.asarray,
                           gather_compact_batch(tree, jnp.asarray(idx[s]),
                                                jnp.asarray(valid[s]),
                                                False, False, None))
        np.testing.assert_array_equal(dev["valid"], host["valid"])
        np.testing.assert_array_equal(dev["labels"], host["labels"])
        np.testing.assert_array_equal(dev["vp"], host["vp"])
        for ck in host["cm"]:
            np.testing.assert_array_equal(
                np.asarray(dev["cm"][ck], host["cm"][ck].dtype),
                host["cm"][ck], err_msg=f"cm.{ck}")


def test_gather_trajectory_matches_scan(tmp_path):
    """make_epoch_step_gather reproduces make_epoch_step on the same index
    order: exact on step 0, fp-reduction tolerance over the trajectory
    (same caveat as test_train.test_scan_epoch_matches_loop)."""
    from druglamp_tpu.train.steps import make_epoch_step, make_epoch_step_gather

    cfg = tiny_config(solver=SolverConfig(compute_dtype="float32"),
                      rs=RSConfig(ssl=True, cm=True))
    root = _make_csv_dataset(tmp_path)
    ds = _dataset(root, cfg)
    emb = _RandEmb()
    emb_store = _emb_store(ds.table, cfg, emb)
    loader = BatchLoader(ds, 4, shuffle=True, drop_last=True, prefetch=0,
                         embeddings=emb, include_llm=True, compact=True,
                         emb_ordinals=True)
    store = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                                  cfg.protein.seq_len,
                                  include_llm=True, emb_ordinals=True)
    tree = store.tree_for(ds)
    model = build_model("DrugLAMP2C2P", cfg, 24, 40)

    stacked = next(loader.stacked_epoch(1, 6))
    ex = jax.tree.map(lambda x: jnp.asarray(x[0]), stacked)
    from druglamp_tpu.data.encoding import decode_batch

    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           decode_batch(ex, store=emb_store),
                           jax.random.key(2), method="init_all")

    def mkstate():
        return TrainState.create(jax.tree.map(jnp.copy, variables),
                                 use_ssl=True, use_cm=True)

    args = (jnp.float32(1e-3), jnp.float32(3e-4), jnp.float32(1e-4),
            jnp.float32(0.5), jnp.float32(1.0))
    ep = make_epoch_step(model, use_ssl=True, use_cm=True, calibrate=True)
    scan_in = jax.tree.map(jnp.asarray, stacked)
    scan_in["_store"] = emb_store
    out_scan = ep(mkstate(), scan_in, jax.random.key(42), *args)

    idx = train_index_plan(loader._order(1), 4)
    epg = make_epoch_step_gather(model, use_ssl=True, use_cm=True,
                                 include_llm=True, emb_ordinals=True,
                                 calibrate=True)
    out_g = epg(mkstate(), jnp.asarray(idx), jnp.ones(idx.shape, jnp.float32),
                tree, emb_store, jax.random.key(42), *args)

    np.testing.assert_allclose(float(out_g.cls_losses[0]),
                               float(out_scan.cls_losses[0]), rtol=1e-6)
    for a, b in [(out_g.cls_losses, out_scan.cls_losses),
                 (out_g.ssl_losses, out_scan.ssl_losses),
                 (out_g.cm_losses, out_scan.cm_losses)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)
    assert float(out_g.cm_weight) == pytest.approx(float(out_scan.cm_weight),
                                                   rel=1e-6)


def test_trainer_device_data_end_to_end(tmp_path):
    """Trainer with device_data trains to finite metrics and its evaluate()
    agrees with the host-pipeline evaluate on the same state."""
    cfg = tiny_config(
        solver=SolverConfig(max_epoch=2, batch_size=4, lr=1e-3, ssl_lr=3e-4,
                            cm_lr=1e-4, seed=1, compute_dtype="float32",
                            scan_chunk=4),
        rs=RSConfig(ssl=True, cm=True, init_epoch=2, epoch_step=2,
                    max_margin=0.5, reset_epoch=10))
    root = _make_csv_dataset(tmp_path)
    train = _dataset(root, cfg)
    val = _dataset(root, cfg, "val.csv", table=train.table)
    emb = _RandEmb()
    emb_store = _emb_store(train.table, cfg, emb)
    mk = lambda ds_, sh: BatchLoader(ds_, 4, shuffle=sh, drop_last=sh,
                                     prefetch=0, embeddings=emb,
                                     include_llm=True, compact=True,
                                     emb_ordinals=True)
    train_l, val_l = mk(train, True), mk(val, False)
    store = DeviceDataStore.build(train.table, cfg.drug.max_nodes,
                                  cfg.protein.seq_len,
                                  include_llm=True, emb_ordinals=True)
    assert DeviceDataStore.supports(train_l)
    model = build_model("DrugLAMP2C2P", cfg, 24, 40)
    tr = Trainer(model, cfg, train_l, val_l, val_l,
                 work_dir=str(tmp_path / "dd"), device_data=store,
                 embed_store=emb_store)
    example = train_l.first_batch()
    metrics = tr.run_experiment(example, seed=7)
    assert np.isfinite(metrics["auroc"])

    tr_host = Trainer(model, cfg, train_l, val_l, val_l,
                      work_dir=str(tmp_path / "host"), embed_store=emb_store)
    state = tr.init_state(example, seed=7)
    m_dev = tr.evaluate(state, val_l, full=True)
    m_host = tr_host.evaluate(state, val_l, full=True)
    for k in m_host:
        assert m_dev[k] == pytest.approx(m_host[k], abs=1e-5), k


def test_gather_epoch_dp_matches_single_device(tmp_path):
    """Gather-mode epoch under a DP mesh (index plan sharded on the sample
    axis, stores replicated) reproduces the unsharded losses up to fp
    reduction-order noise — the multichip placement the trainer uses via
    MeshContext.shard_stacked_batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from druglamp_tpu.data.encoding import decode_batch
    from druglamp_tpu.parallel.mesh import MeshContext, make_mesh
    from druglamp_tpu.train.steps import make_epoch_step_gather

    cfg = tiny_config(solver=SolverConfig(compute_dtype="float32"),
                      rs=RSConfig())
    root = _make_csv_dataset(tmp_path)
    ds = _dataset(root, cfg)
    B = 8                                        # divisible by the data axis
    loader = BatchLoader(ds, B, shuffle=True, drop_last=True, prefetch=0,
                         include_llm=False, compact=True)
    store = DeviceDataStore.build(ds.table, cfg.drug.max_nodes,
                                  cfg.protein.seq_len,
                                  include_llm=False, emb_ordinals=False)
    tree = store.tree_for(ds)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    ex = loader.first_batch()
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           decode_batch(jax.tree.map(jnp.asarray, ex)),
                           jax.random.key(2), method="init_all")

    idx = train_index_plan(loader._order(1), B)[:2]
    ones = np.ones(idx.shape, np.float32)
    epg = make_epoch_step_gather(model, use_ssl=False, use_cm=False,
                                 include_llm=False, emb_ordinals=False)

    def mkstate():
        return TrainState.create(jax.tree.map(jnp.copy, variables),
                                 use_ssl=False, use_cm=False)

    args = (jnp.float32(1e-3), jnp.float32(3e-4), jnp.float32(1e-4),
            jnp.float32(0.5), jnp.float32(1.0))
    out1 = epg(mkstate(), jnp.asarray(idx), jnp.asarray(ones), tree, None,
               jax.random.key(9), *args)

    ctx = MeshContext(make_mesh(1))              # (data=8, model=1)
    repl = NamedSharding(ctx.mesh, P())
    tree_r = jax.device_put(tree, repl)
    plan = ctx.shard_stacked_batch({"idx": idx, "valid": ones})
    out8 = epg(ctx.shard_state(mkstate()), plan["idx"], plan["valid"],
               tree_r, None, jax.random.key(9), *args)
    np.testing.assert_allclose(np.asarray(out1.cls_losses),
                               np.asarray(out8.cls_losses),
                               rtol=5e-3, atol=1e-5)


def test_supports_rejects_unsupported_loaders(tmp_path):
    cfg = tiny_config()
    root = _make_csv_dataset(tmp_path)
    ds = _dataset(root, cfg)
    dense = BatchLoader(ds, 4, shuffle=True, drop_last=True, prefetch=0,
                        include_llm=False, compact=False)
    assert not DeviceDataStore.supports(dense)
    grouped = BatchLoader(ds, 4, shuffle=True, drop_last=True, prefetch=0,
                          include_llm=False, compact=True)
    grouped.cm_groups = 2
    assert not DeviceDataStore.supports(grouped)
    llm_dense = BatchLoader(ds, 4, shuffle=True, drop_last=True, prefetch=0,
                            include_llm=True, compact=True,
                            emb_ordinals=False)
    assert not DeviceDataStore.supports(llm_dense)
