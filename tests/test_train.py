"""Training loop tests: schedule, step functions, mini end-to-end fit."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from druglamp_tpu.config import RSConfig, SolverConfig
from druglamp_tpu.data.dataset import DTIDataset
from druglamp_tpu.data.loader import BatchLoader
from druglamp_tpu.models.registry import build_model
from druglamp_tpu.train.schedule import cosine_warmup_restarts_lr
from druglamp_tpu.train.state import TrainState
from druglamp_tpu.train.steps import make_eval_step, make_train_step
from druglamp_tpu.train.trainer import Trainer
from druglamp_tpu.utils.logging import ExperimentLogger
from tests.util import make_batch, tiny_config


def test_schedule_values():
    # warmup: linear from min_lr to max_lr over warmup epochs
    max_lr, min_lr, W, E = 1e-4, 1e-8, 20, 100
    f = lambda e: cosine_warmup_restarts_lr(e, E, max_lr, min_lr, W)
    assert f(0) == pytest.approx(min_lr)
    assert f(10) == pytest.approx((max_lr - min_lr) * 10 / 20 + min_lr)
    assert f(20) == pytest.approx(max_lr)
    # cosine end of cycle back to ~min
    assert f(99) < f(60) < f(20)
    assert f(99) == pytest.approx(min_lr + (max_lr - min_lr) *
                                  (1 + math.cos(math.pi * 79 / 80)) / 2)
    # restart
    assert f(100) == pytest.approx(f(0))
    assert f(120) == pytest.approx(f(20))


def _make_csv_dataset(tmp_path, n=24):
    smis = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1", "c1ccncc1"]
    prots = ["MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ",
             "MSEQNNTEMTFQIQRIYTKDIS",
             "MAHHHHHHVGTGSNG"]
    import csv
    d = tmp_path / "toy" / "random"
    os.makedirs(d, exist_ok=True)
    rows = []
    r = np.random.RandomState(0)
    for i in range(n):
        rows.append({"SMILES": smis[i % len(smis)],
                     "Protein": prots[i % len(prots)],
                     "Y": int(r.rand() < 0.5)})
    for name, sl in [("train.csv", slice(0, n)), ("val.csv", slice(0, 12)),
                     ("test.csv", slice(12, 24))]:
        with open(d / name, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["SMILES", "Protein", "Y"])
            w.writeheader()
            for row in rows[sl]:
                w.writerow(row)
    return str(tmp_path)


def _loaders(root, cfg, bs=4):
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    train = DTIDataset(root, "toy", "random", "train.csv", **kw)
    val = DTIDataset(root, "toy", "random", "val.csv", table=train.table, **kw)
    test = DTIDataset(root, "toy", "random", "test.csv", table=train.table, **kw)
    from druglamp_tpu.data.cache import ZeroEmbeddings

    emb = ZeroEmbeddings(24, 40)
    mk = lambda ds, sh, dl: BatchLoader(ds, bs, shuffle=sh, drop_last=dl,
                                        embeddings=emb, prefetch=0)
    return mk(train, True, True), mk(val, False, False), mk(test, False, False)


def _tiny_training_cfg(**rs):
    return tiny_config(
        solver=SolverConfig(max_epoch=4, batch_size=4, lr=1e-3, ssl_lr=3e-4,
                            cm_lr=1e-4, seed=1, compute_dtype="float32"),
        rs=RSConfig(ssl=rs.get("ssl", False), cm=rs.get("cm", False),
                    init_epoch=2, epoch_step=2, max_margin=0.5, reset_epoch=10),
    )


def test_train_step_decreases_loss():
    cfg = _tiny_training_cfg()
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 4, n_drug_feature=24,
                                                 n_prot_feature=40))
    from druglamp_tpu.data.loader import build_cm_arrays

    batch["cm"] = jax.tree.map(jnp.asarray, build_cm_arrays(
        np.arange(4), np.arange(4), np.asarray(batch["labels"])))
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    state = TrainState.create(variables, use_ssl=False, use_cm=False)
    step = make_train_step(model, use_ssl=False, use_cm=False)
    rng = jax.random.key(3)
    losses = []
    for i in range(8):
        rng, k = jax.random.split(rng)
        out = step(state, batch, k, jnp.float32(1e-2), jnp.float32(0.0),
                   jnp.float32(0.0), jnp.float32(0.5), jnp.float32(1.0))
        state = out.state
        losses.append(float(out.cls_loss))
    assert losses[-1] < losses[0]  # overfits a single batch


def test_train_step_ssl_cm_variants_and_calibration():
    cfg = _tiny_training_cfg(ssl=True, cm=True)
    model = build_model("DrugLAMP2C2P", cfg, 24, 40)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 4, n_drug_feature=24,
                                                 n_prot_feature=40))
    from druglamp_tpu.data.loader import build_cm_arrays

    cm = build_cm_arrays(np.array([0, 0, 1, 1]), np.array([0, 1, 0, 2]),
                         np.array([1.0, 0.0, 0.0, 1.0]))
    batch["cm"] = jax.tree.map(jnp.asarray, cm)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    state = TrainState.create(variables, use_ssl=True, use_cm=True)
    step = make_train_step(model, use_ssl=True, use_cm=True, calibrate=True)
    out = step(state, batch, jax.random.key(3), jnp.float32(1e-3),
               jnp.float32(3e-4), jnp.float32(1e-4), jnp.float32(0.5),
               jnp.float32(1.0))
    assert np.isfinite(float(out.cls_loss))
    assert np.isfinite(float(out.ssl_loss)) and float(out.ssl_loss) > 0
    assert np.isfinite(float(out.cm_loss))
    w = float(out.cm_weight)
    cm_raw = float(out.cm_loss) / w if w else 0.0
    cls = float(out.cls_loss)
    if cm_raw > 0:
        # calibrated weight puts cm*w within [cls/10, 10*cls]
        assert cm_raw * w <= 10 * cls + 1e-6
        assert cm_raw * w >= cls / 10 - 1e-6


def test_legacy_aliased_mode_runs():
    cfg = _tiny_training_cfg(ssl=True)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 4, n_drug_feature=24,
                                                 n_prot_feature=40))
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    state = TrainState.create(variables, use_ssl=True, use_cm=False)
    step = make_train_step(model, use_ssl=True, use_cm=False,
                           grad_mode="legacy_aliased")
    out = step(state, batch, jax.random.key(3), jnp.float32(1e-3),
               jnp.float32(3e-4), jnp.float32(0.0), jnp.float32(0.5),
               jnp.float32(1.0))
    assert np.isfinite(float(out.cls_loss))


def test_trainer_end_to_end(tmp_path):
    root = _make_csv_dataset(tmp_path)
    cfg = _tiny_training_cfg(ssl=True)
    train_l, val_l, test_l = _loaders(root, cfg)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    logger = ExperimentLogger(str(tmp_path / "results"), "toy-test", quiet=True)
    tr = Trainer(model, cfg, train_l, val_l, test_l, logger=logger,
                 work_dir=str(tmp_path / "work"))
    example = next(train_l.epoch(0))
    metrics = tr.run_experiment(example, seed=1)
    assert set(metrics) >= {"auroc", "auprc", "ausum", "acc", "sn", "sp", "f1", "pr"}
    assert np.isfinite(metrics["acc"])
    assert tr.best_epoch >= 1
    assert os.path.exists(tmp_path / "work" / "ckpt_best")
    # metrics.jsonl written
    assert os.path.getsize(logger.jsonl_path) > 0


def test_checkpoint_roundtrip(tmp_path):
    root = _make_csv_dataset(tmp_path)
    cfg = _tiny_training_cfg()
    train_l, val_l, test_l = _loaders(root, cfg)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    tr = Trainer(model, cfg, train_l, val_l, test_l, work_dir=str(tmp_path / "w2"))
    example = next(train_l.epoch(0))
    state = tr.init_state(example, seed=3)
    tr._save(str(tmp_path / "w2" / "ckpt"), state)
    restored = tr.restore(str(tmp_path / "w2" / "ckpt"), state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    s1 = make_eval_step(model)(state.params, state.batch_stats,
                               jax.tree.map(jnp.asarray, example))[0]
    s2 = make_eval_step(model)(restored.params, restored.batch_stats,
                               jax.tree.map(jnp.asarray, example))[0]
    assert np.allclose(np.asarray(s1), np.asarray(s2))


def test_flat_opt_checkpoint_restores_fields_by_name(tmp_path):
    """Advisor r4 (medium): orbax restores FlatAdamWState as a plain dict
    whose leaves flatten sorted-by-key (count, m, v); a positional unflatten
    against the (m, v, count) declaration order silently assigned
    m=count, v=m, count=v.  _restore_like must match by field NAME."""
    import orbax.checkpoint as ocp

    from druglamp_tpu.train.state import FlatAdamWState, make_adamw_tx
    from druglamp_tpu.train.trainer import _restore_like

    ck = ocp.PyTreeCheckpointer()
    flat = FlatAdamWState(m=jnp.full((4,), 1.0), v=jnp.full((4,), 2.0),
                          count=jnp.asarray(7, jnp.int32))
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    opt = make_adamw_tx().init(params)
    ck.save(os.path.abspath(tmp_path / "c"),
            {"opt_flat": flat, "opt": opt}, force=True)
    tree = ck.restore(os.path.abspath(tmp_path / "c"))
    rf = _restore_like(flat, tree["opt_flat"])
    assert int(rf.count) == 7
    np.testing.assert_array_equal(np.asarray(rf.m), 1.0)
    np.testing.assert_array_equal(np.asarray(rf.v), 2.0)
    ro = _restore_like(opt, tree["opt"])
    assert jax.tree.structure(ro) == jax.tree.structure(opt)
    assert type(ro[0]).__name__ == "ScaleByAdamState"
    np.testing.assert_array_equal(np.asarray(ro[0].mu["w"]),
                                  np.asarray(opt[0].mu["w"]))


def test_resume_roundtrip_flat_opt(tmp_path):
    """Full save→restore of a trained TrainState with DRUGLAMP_FLAT_OPT=1:
    the restored optimizer must continue the trajectory bit-for-bit."""
    cfg = _tiny_training_cfg()
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 4, n_drug_feature=24,
                                                 n_prot_feature=40))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    state = TrainState.create(variables, use_ssl=False, use_cm=False,
                              flat_opt=True)
    step = make_train_step(model, use_ssl=False, use_cm=False)
    args = (jnp.float32(1e-3), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(0.5), jnp.float32(1.0))
    rng = jax.random.key(9)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state = step(state, batch, k, *args).state
    root = _make_csv_dataset(tmp_path)
    train_l, val_l, test_l = _loaders(root, cfg)
    tr = Trainer(model, cfg, train_l, val_l, test_l,
                 work_dir=str(tmp_path / "wflat"))
    tr._save(str(tmp_path / "wflat" / "ckpt"), state)
    restored = tr.restore(str(tmp_path / "wflat" / "ckpt"), state)
    assert int(restored.opt_cls.count) == int(state.opt_cls.count) == 3
    np.testing.assert_array_equal(np.asarray(restored.opt_cls.m),
                                  np.asarray(state.opt_cls.m))
    np.testing.assert_array_equal(np.asarray(restored.opt_cls.v),
                                  np.asarray(state.opt_cls.v))
    # one more step from each must agree bitwise
    k = jax.random.key(11)
    a = step(state, batch, k, *args).state
    b = step(restored, batch, k, *args).state
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_continues_training(tmp_path):
    root = _make_csv_dataset(tmp_path)
    cfg = _tiny_training_cfg()
    train_l, val_l, test_l = _loaders(root, cfg)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    wd = str(tmp_path / "resume")
    tr1 = Trainer(model, cfg, train_l, val_l, test_l, work_dir=wd)
    example = next(train_l.epoch(0))
    tr1.run_experiment(example, seed=2)
    assert tr1.epoch >= 1
    # new trainer resumes and (max_epoch already reached) skips straight to done
    tr2 = Trainer(model, cfg, train_l, val_l, test_l, work_dir=wd)
    metrics = tr2.run_experiment(example, seed=2, resume=True)
    assert tr2.epoch == tr1.epoch               # restored host state
    assert tr2.best_ausum == pytest.approx(tr1.best_ausum)
    assert "auroc" in metrics


@pytest.mark.slow
def test_per_loss_grads_match_independent_grads():
    """The shared-vjp per-loss gradients equal separately computed grads."""
    cfg = _tiny_training_cfg(ssl=True)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 4, n_drug_feature=24,
                                                 n_prot_feature=40))
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    params, stats = variables["params"], variables["batch_stats"]
    drop1, drop2, mlm = jax.random.split(jax.random.key(7), 3)

    from druglamp_tpu.losses.classification import binary_cross_entropy

    def cls_only(p):
        out, _ = model.apply({"params": p, "batch_stats": stats}, batch,
                             train=True, rngs={"dropout": drop1},
                             mutable=["batch_stats"])
        return binary_cross_entropy(out["score"], batch["labels"])[1]

    def ssl_only(p):
        out, muts = model.apply({"params": p, "batch_stats": stats}, batch,
                                train=True, rngs={"dropout": drop1},
                                mutable=["batch_stats"])
        d, _ = model.apply({"params": p, "batch_stats": muts["batch_stats"]},
                           out["ssl_inputs"], mlm, True, method="ssl_loss",
                           mutable=["batch_stats"], rngs={"dropout": drop2})
        return (d["prot_ssl"] + d["drug_ssl"]) * 0.1

    def both(p):
        out, muts = model.apply({"params": p, "batch_stats": stats}, batch,
                                train=True, rngs={"dropout": drop1},
                                mutable=["batch_stats"])
        cls = binary_cross_entropy(out["score"], batch["labels"])[1]
        d, _ = model.apply({"params": p, "batch_stats": muts["batch_stats"]},
                           out["ssl_inputs"], mlm, True, method="ssl_loss",
                           mutable=["batch_stats"], rngs={"dropout": drop2})
        return cls, (d["prot_ssl"] + d["drug_ssl"]) * 0.1

    losses, vjp_fn = jax.vjp(both, params)
    g_cls_v = vjp_fn((jnp.float32(1.0), jnp.float32(0.0)))[0]
    g_ssl_v = vjp_fn((jnp.float32(0.0), jnp.float32(1.0)))[0]
    g_cls = jax.grad(cls_only)(params)
    g_ssl = jax.grad(ssl_only)(params)

    for a, b in zip(jax.tree.leaves(g_cls_v), jax.tree.leaves(g_cls)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ssl_v), jax.tree.leaves(g_ssl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_train_step_on_compact_llm_batch(tmp_path):
    """Full 2C2P train step consuming the compact (fused-able) batch form
    with xp_src device-side tiling — the exact path of full-model CLI runs."""
    import jax

    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.encoding import decode_batch

    root = _make_csv_dataset(tmp_path)
    cfg = _tiny_training_cfg(ssl=True, cm=True)
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    ds = DTIDataset(root, "toy", "random", "train.csv", **kw)
    cache = EmbeddingCache(str(tmp_path / "emb"), "toy", 24, 40)
    r = np.random.RandomState(0)
    for o in range(ds.table.n_drug):
        cache.put_drug(o, r.rand(7, 24).astype(np.float32))
    for o in range(ds.table.n_prot):
        cache.put_prot(o, r.rand(20, 40).astype(np.float32))
    loader = BatchLoader(ds, 4, shuffle=False, drop_last=True, prefetch=0,
                         embeddings=cache, compact=True)
    batch = next(loader.epoch(0))
    jb = jax.tree.map(jnp.asarray, batch)

    model = build_model("DrugLAMP2C2P", cfg, 24, 40)
    example = decode_batch(jb)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           example, jax.random.key(2), method="init_all")
    state = TrainState.create(variables, use_ssl=True, use_cm=True)
    step = make_train_step(model, use_ssl=True, use_cm=True, calibrate=True)
    out = step(state, jb, jax.random.key(3), jnp.float32(1e-3),
               jnp.float32(3e-4), jnp.float32(1e-4), jnp.float32(0.5),
               jnp.float32(1.0))
    assert np.isfinite(float(out.cls_loss))
    assert np.isfinite(float(out.ssl_loss))
    assert np.isfinite(float(out.cm_loss))


@pytest.mark.slow
def test_scan_epoch_matches_loop():
    """The epoch-in-scan driver reproduces the per-step loop trajectory:
    identical rng chain and CM-weight threading.  Step 0 matches exactly;
    later steps agree up to fp reduction-order noise (the scan body is a
    different XLA program, and Adam amplifies O(1e-7) gradient reorderings
    — same caveat as test_parallel.test_dp8_matches_single_device)."""
    from druglamp_tpu.data.loader import build_cm_arrays
    from druglamp_tpu.train.steps import make_epoch_step

    cfg = tiny_config(solver=SolverConfig(compute_dtype="float32"),
                      rs=RSConfig(ssl=True, cm=True))
    model = build_model("DrugLAMP2C2P", cfg, 24, 40)
    B = 4
    batches = []
    for i in range(4):
        b = make_batch(cfg, B, n_drug_feature=24, n_prot_feature=40, seed=i)
        b["cm"] = build_cm_arrays(np.arange(B) % 2, np.arange(B), b["labels"])
        batches.append(jax.tree.map(jnp.asarray, b))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batches[0], jax.random.key(2), method="init_all")

    def mkstate():
        return TrainState.create(jax.tree.map(jnp.copy, variables),
                                 use_ssl=True, use_cm=True)

    args = (jnp.float32(1e-3), jnp.float32(3e-4), jnp.float32(1e-4),
            jnp.float32(0.5), jnp.float32(1.0))
    step = make_train_step(model, use_ssl=True, use_cm=True, calibrate=True)
    state, rng, w = mkstate(), jax.random.key(42), args[-1]
    loop_losses = []
    for b in batches:
        rng, k = jax.random.split(rng)
        out = step(state, b, k, *args[:-1], w)
        state, w = out.state, out.cm_weight
        loop_losses.append([float(out.cls_loss), float(out.ssl_loss),
                            float(out.cm_loss)])

    ep = make_epoch_step(model, use_ssl=True, use_cm=True, calibrate=True)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    out2 = ep(mkstate(), stacked, jax.random.key(42), *args)

    # step 0: same inputs, exact agreement (rng chain + batch plumbing)
    np.testing.assert_allclose(loop_losses[0],
                               [float(out2.cls_losses[0]),
                                float(out2.ssl_losses[0]),
                                float(out2.cm_losses[0])], rtol=1e-6)
    # full trajectory: fp reduction-order tolerance
    scan_losses = np.stack([np.asarray(out2.cls_losses),
                            np.asarray(out2.ssl_losses),
                            np.asarray(out2.cm_losses)], axis=1)
    np.testing.assert_allclose(np.asarray(loop_losses), scan_losses,
                               rtol=2e-3, atol=1e-5)
    assert float(out2.cm_weight) == pytest.approx(float(w), rel=1e-6)


@pytest.mark.slow
def test_trainer_scan_mode_end_to_end(tmp_path):
    """Trainer.fit with scan_chunk>1 (incl. a ragged tail chunk) trains,
    checkpoints, and evaluates like loop mode."""
    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config(
        solver=SolverConfig(max_epoch=3, batch_size=4, lr=1e-3, ssl_lr=3e-4,
                            cm_lr=1e-4, seed=1, compute_dtype="float32",
                            scan_chunk=4),   # 6 batches/epoch → chunks 4 + 2
        rs=RSConfig(ssl=True, cm=True, init_epoch=2, epoch_step=2,
                    max_margin=0.5, reset_epoch=10))
    train_l, val_l, test_l = _loaders(root, cfg)
    model = build_model("DrugLAMP2C2P", cfg, 24, 40)
    tr = Trainer(model, cfg, train_l, val_l, test_l,
                 work_dir=str(tmp_path / "scanwork"))
    example = next(train_l.epoch(0))
    metrics = tr.run_experiment(example, seed=7)
    assert np.isfinite(metrics["auroc"])
    assert tr.best_epoch >= 1


def test_evaluate_scan_matches_loop(tmp_path):
    """Trainer.evaluate via eval-in-scan equals the per-batch path."""
    root = _make_csv_dataset(tmp_path)
    mk = lambda chunk: tiny_config(
        solver=SolverConfig(max_epoch=1, batch_size=4, compute_dtype="float32",
                            scan_chunk=chunk),
        rs=RSConfig())
    cfg = mk(4)
    train_l, val_l, test_l = _loaders(root, cfg)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    tr_scan = Trainer(model, cfg, train_l, val_l, test_l,
                      work_dir=str(tmp_path / "es"))
    tr_loop = Trainer(model, mk(0), train_l, val_l, test_l,
                      work_dir=str(tmp_path / "el"))
    example = next(train_l.epoch(0))
    state = tr_scan.init_state(example, seed=5)
    m_scan = tr_scan.evaluate(state, test_l, full=True)
    m_loop = tr_loop.evaluate(state, test_l, full=True)
    for k in m_loop:
        assert m_scan[k] == pytest.approx(m_loop[k], abs=1e-6), k


@pytest.mark.slow
def test_trainer_with_device_store(tmp_path):
    """End-to-end fit with the device-resident embedding store ("_store"
    threading through the epoch/eval scans) matches the host-shipped path's
    first-epoch loss and completes with finite metrics."""
    import ml_dtypes

    from druglamp_tpu.data.device_store import DeviceEmbeddingStore

    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config(
        solver=SolverConfig(max_epoch=2, batch_size=4, lr=1e-3, ssl_lr=3e-4,
                            cm_lr=1e-4, seed=1, compute_dtype="float32",
                            scan_chunk=4),
        rs=RSConfig(ssl=True, cm=True, init_epoch=2, epoch_step=2,
                    max_margin=0.5, reset_epoch=10))
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    train = DTIDataset(root, "toy", "random", "train.csv", **kw)
    val = DTIDataset(root, "toy", "random", "val.csv", table=train.table, **kw)

    class Emb:
        n_drug_feature, n_prot_feature = 24, 40
        def drug(self, o):
            return (np.random.RandomState(o).randn(6, 24)
                    .astype(ml_dtypes.bfloat16))
        def prot(self, o):
            return (np.random.RandomState(50 + o).randn(11, 40)
                    .astype(ml_dtypes.bfloat16))

    store = DeviceEmbeddingStore.build(
        train.table, Emb(), max_drug_tokens=cfg.drug.max_nodes,
        max_prot_len=cfg.protein.max_resis + 2)

    def run(use_store):
        mk = lambda ds_, sh: BatchLoader(
            ds_, 4, shuffle=sh, drop_last=sh, embeddings=Emb(), prefetch=0,
            include_llm=True, compact=True, emb_ordinals=use_store)
        tr = Trainer(build_model("DrugLAMP2C2P", cfg, 24, 40), cfg,
                     mk(train, True), mk(val, False), mk(val, False),
                     work_dir=str(tmp_path / f"st{use_store}"),
                     embed_store=store.tree if use_store else None)
        example = next(mk(train, True).epoch(0))
        state = tr.init_state(example, seed=9)
        state = tr.fit(state, seed=9)
        m = tr.evaluate(state, mk(val, False), full=True)
        return tr, m

    tr_s, m_s = run(True)
    tr_h, m_h = run(False)
    assert np.isfinite(m_s["auroc"])
    for k in ("auroc", "auprc", "acc"):
        assert m_s[k] == pytest.approx(m_h[k], abs=5e-3), k


def test_flat_adamw_matches_optax_tree_adamw():
    """The raveled-buffer AdamW (state.FlatAdamWState, a kernel-count
    optimization for the latency-bound bs-16 step) must be elementwise
    equivalent to the per-leaf optax chain it replaces."""
    from druglamp_tpu.train.state import (apply_optimizer, init_flat_opt,
                                          make_adamw_tx)

    key = jax.random.key(0)
    ks = jax.random.split(key, 6)
    params = {"a": {"w": jax.random.normal(ks[0], (5, 3)),
                    "b": jax.random.normal(ks[1], (3,))},
              "c": jax.random.normal(ks[2], (2, 2, 2))}
    tree_state = make_adamw_tx().init(params)
    flat_state = init_flat_opt(params)
    p_tree, p_flat = params, params
    for i in range(5):
        g = jax.tree.map(
            lambda p, k=ks[3 + i % 3], i=i: 0.1 * p + 0.01 * (i + 1)
            * jax.random.normal(jax.random.fold_in(k, i), p.shape), p_tree)
        p_tree, tree_state = apply_optimizer(tree_state, g, p_tree,
                                             jnp.float32(1e-3))
        p_flat, flat_state = apply_optimizer(flat_state, g, p_flat,
                                             jnp.float32(1e-3))
    for a, b in zip(jax.tree.leaves(p_tree), jax.tree.leaves(p_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_train_state_flat_opt_flag():
    from druglamp_tpu.train.state import FlatAdamWState

    cfg = tiny_config()
    model = build_model("DrugLAMPwoLLM", cfg)
    batch = make_batch(cfg, 4)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    st = TrainState.create(variables, use_ssl=False, use_cm=False,
                           flat_opt=True)
    assert isinstance(st.opt_cls, FlatAdamWState)
    # one full train step through the flat path runs and stays finite
    step = make_train_step(model, use_ssl=False, use_cm=False)
    out = step(st, batch, jax.random.key(3), jnp.float32(1e-4),
               jnp.float32(3e-5), jnp.float32(1e-5), jnp.float32(0.5),
               jnp.float32(1.0))
    assert np.isfinite(float(out.cls_loss))


def test_remat_step_matches_default(monkeypatch):
    """DRUGLAMP_REMAT ∈ {dots, full} recomputes the SAME forward math in the
    backward, so losses (forward) and gradients must match the default
    save-everything mode (train/steps.py::_remat_wrap).

    Compared at the loss/gradient level, not post-AdamW params: the forward
    computes in bf16 and remat's recompute is re-fused by XLA, so grads
    differ at bf16-ulp level — AdamW's v-normalizer amplifies that into
    sign-flips of near-zero updates, making early-step param comparison
    chaotic by construction."""
    from druglamp_tpu.train.steps import StepOutput, _make_step_body

    cfg = _tiny_training_cfg(ssl=True, cm=True)
    model = build_model("DrugLAMP2C2P", cfg, 24, 40)
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, 4, n_drug_feature=24,
                                                 n_prot_feature=40))
    from druglamp_tpu.data.loader import build_cm_arrays

    batch["cm"] = jax.tree.map(jnp.asarray, build_cm_arrays(
        np.arange(4), np.arange(4), np.asarray(batch["labels"])))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")

    def run(mode):
        if mode is None:
            monkeypatch.delenv("DRUGLAMP_REMAT", raising=False)
        else:
            monkeypatch.setenv("DRUGLAMP_REMAT", mode)
        state = TrainState.create(jax.tree.map(jnp.array, variables),
                                  use_ssl=True, use_cm=True)
        step = make_train_step(model, use_ssl=True, use_cm=True,
                               calibrate=True)
        out = step(state, batch, jax.random.key(3), jnp.float32(1e-3),
                   jnp.float32(3e-4), jnp.float32(1e-4), jnp.float32(0.5),
                   jnp.float32(1.0))
        losses = (float(out.cls_loss), float(out.ssl_loss),
                  float(out.cm_loss))
        assert all(np.isfinite(v) for v in losses)
        # post-1-step params as a gradient proxy at loose (bf16-ulp through
        # AdamW) tolerance — sign/scale of every update must agree
        return losses, jax.tree.map(np.asarray, out.state.params)

    base_losses, base_params = run(None)
    for mode in ("dots", "full"):
        got_losses, got_params = run(mode)
        # the primal losses agree to bf16-refusion tolerance (checkpoint
        # changes the jaxpr, so XLA fuses even the forward differently)
        np.testing.assert_allclose(got_losses, base_losses, rtol=1e-4,
                                   atol=1e-6)
        mismatched = total = 0
        for a, b in zip(jax.tree.leaves(base_params),
                        jax.tree.leaves(got_params)):
            close = np.isclose(a, b, rtol=0.15, atol=5e-4)
            mismatched += int((~close).sum())
            total += int(close.size)
        # allow isolated near-zero-gradient sign flips, nothing systematic
        assert mismatched <= max(2, total // 2000), (mode, mismatched, total)


def test_remat_bad_mode_raises(monkeypatch):
    monkeypatch.setenv("DRUGLAMP_REMAT", "bogus")
    from druglamp_tpu.train.steps import _remat_wrap

    with np.testing.assert_raises(ValueError):
        _remat_wrap(lambda p: p)
