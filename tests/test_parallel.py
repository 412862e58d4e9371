"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from druglamp_tpu.data.loader import build_cm_arrays
from druglamp_tpu.models.registry import build_model
from druglamp_tpu.parallel.mesh import MeshContext, make_mesh
from druglamp_tpu.train.state import TrainState
from druglamp_tpu.train.steps import make_eval_step, make_train_step
from tests.util import make_batch, tiny_config

from druglamp_tpu.config import SolverConfig

B = 8
# float32 compute: these tests compare sharded vs unsharded numerics, and
# bf16 cross-shard reduction reordering would dominate the tolerance
CFG = tiny_config(solver=SolverConfig(compute_dtype="float32"))


def _setup(use_ssl=True, use_cm=True):
    model = build_model("DrugLAMP2C2P", CFG, 24, 40)
    batch = make_batch(CFG, B, n_drug_feature=24, n_prot_feature=40)
    batch["cm"] = build_cm_arrays(np.arange(B) % 3, np.arange(B) % 5,
                                  batch["labels"])
    batch = jax.tree.map(jnp.asarray, batch)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           batch, jax.random.key(2), method="init_all")
    state = TrainState.create(variables, use_ssl=use_ssl, use_cm=use_cm)
    return model, batch, state


def _run_step(model, state, batch, use_ssl, use_cm):
    step = make_train_step(model, use_ssl=use_ssl, use_cm=use_cm)
    return step(state, batch, jax.random.key(3), jnp.float32(1e-3),
                jnp.float32(3e-4), jnp.float32(1e-4), jnp.float32(0.5),
                jnp.float32(1.0))


@pytest.mark.slow
def test_dp8_executes_and_shards():
    assert jax.device_count() >= 8
    model, batch, state = _setup()
    ctx = MeshContext(make_mesh(1))
    assert ctx.n_data == 8
    sb = ctx.shard_batch(batch)
    ss = ctx.shard_state(state)
    out = _run_step(model, ss, sb, use_ssl=True, use_cm=True)
    assert np.isfinite(float(out.cls_loss))
    # batch stayed sharded over data axis
    shard_counts = {len(d.sharding.device_set) for d in jax.tree.leaves(sb)
                    if hasattr(d, "sharding")}
    assert 8 in shard_counts


@pytest.mark.slow
def test_dp8_matches_single_device():
    """Sharded and unsharded steps agree up to fp reduction-order noise.

    Post-Adam params are NOT compared: Adam normalizes by sqrt(v), so an
    O(1e-7) gradient reordering difference flips near-zero updates by O(lr).
    Losses and raw gradients are the meaningful comparison.
    """
    model, batch, state = _setup(use_ssl=False, use_cm=False)
    model2, batch2, state2 = _setup(use_ssl=False, use_cm=False)
    ctx = MeshContext(make_mesh(1))
    sb, ss = ctx.shard_batch(batch2), ctx.shard_state(state2)

    from druglamp_tpu.losses.classification import binary_cross_entropy

    def loss_fn(params, stats, b):
        out = model.apply({"params": params, "batch_stats": stats}, b, train=False)
        return binary_cross_entropy(out["score"], b["labels"])[1]

    # grads first: the train step donates its state buffers
    g1 = jax.jit(jax.grad(loss_fn))(state.params, state.batch_stats, batch)
    g8 = jax.jit(jax.grad(loss_fn))(ss.params, ss.batch_stats, sb)

    out1 = _run_step(model, state, batch, False, False)
    out8 = _run_step(model2, ss, sb, False, False)
    assert float(out1.cls_loss) == pytest.approx(float(out8.cls_loss), rel=1e-3)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_tensor_parallel_mesh():
    model, batch, state = _setup(use_ssl=False, use_cm=False)
    mesh = make_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    ctx = MeshContext(mesh, tensor_parallel=True)
    ss = ctx.shard_state(state)
    sb = ctx.shard_batch(batch)
    # at least one kernel actually sharded over the model axis
    from jax.sharding import PartitionSpec as P

    flat = jax.tree_util.tree_flatten_with_path(ss.params)[0]
    specs = [leaf.sharding.spec for _, leaf in flat]
    assert any("model" in str(s) for s in specs), specs
    out = _run_step(model, ss, sb, False, False)
    assert np.isfinite(float(out.cls_loss))

    # numerics match the unsharded step
    model1, batch1, state1 = _setup(use_ssl=False, use_cm=False)
    out1 = _run_step(model1, state1, batch1, False, False)
    assert float(out1.cls_loss) == pytest.approx(float(out.cls_loss), rel=1e-5)


def test_eval_step_sharded():
    model, batch, state = _setup(use_ssl=False, use_cm=False)
    ctx = MeshContext(make_mesh(1))
    ev = make_eval_step(model)
    probs, loss = ev(ctx.replicate(state.params), ctx.replicate(state.batch_stats),
                     ctx.shard_batch(batch))
    assert probs.shape == (B,)
    assert np.isfinite(float(loss))


def test_distributed_noop_without_config(monkeypatch):
    from druglamp_tpu.parallel import distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.maybe_initialize_distributed() is False
    assert distributed.process_count() == 1
    assert distributed.is_primary()


def test_trainer_evaluate_fused_mesh_matches_plain(tmp_path):
    """Trainer.evaluate with the fused 8-way-sharded transfer equals the
    unsharded path (same probs → same metrics)."""
    from druglamp_tpu.config import RSConfig, SolverConfig
    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.train.trainer import Trainer
    from tests.test_train import _make_csv_dataset
    from tests.util import tiny_config

    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config(solver=SolverConfig(max_epoch=1, batch_size=8,
                                          compute_dtype="float32"),
                      rs=RSConfig())
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    ds = DTIDataset(root, "toy", "random", "train.csv", **kw)
    emb = ZeroEmbeddings(24, 40)
    mk = lambda compact: BatchLoader(ds, 8, shuffle=False, drop_last=True,
                                     embeddings=emb, prefetch=0,
                                     include_llm=False, compact=compact)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)

    tr_plain = Trainer(model, cfg, mk(False), mk(False), mk(False),
                       work_dir=str(tmp_path / "p"))
    state = tr_plain.init_state(next(mk(False).epoch(0)), seed=3)
    m_plain = tr_plain.evaluate(state, mk(False), full=True)

    ctx = MeshContext(make_mesh(1))
    tr_mesh = Trainer(model, cfg, mk(True), mk(True), mk(True),
                      work_dir=str(tmp_path / "m"),
                      shard_fn=ctx.fused_shard_batch)
    m_mesh = tr_mesh.evaluate(state, mk(True), full=True)
    for k in ("auroc", "auprc", "acc"):
        assert m_mesh[k] == pytest.approx(m_plain[k], abs=1e-6), k


class TestPerReplicaBN:
    """solver.bn_mode='per_replica' — torch-DDP BN emulation (VERDICT item 6;
    reference DDP never syncs BN stats, trainer.py:147)."""

    def test_grouped_bn_matches_torch_ddp_mirror(self):
        """TorchBatchNorm(groups=2) == two independent torch BatchNorm1d
        replicas: each half normalized by its own stats; running stats follow
        the rank-0 (first-half) module torch would checkpoint."""
        import torch

        from druglamp_tpu.nn.layers import TorchBatchNorm

        rng = np.random.RandomState(0)
        x = rng.randn(8, 5).astype(np.float32) * np.array([1, 2, 3, 4, 5], np.float32)
        x[4:] += 3.0  # make the two replica-halves distributionally distinct

        bn = TorchBatchNorm(groups=2)
        variables = bn.init(jax.random.key(0), jnp.asarray(x),
                            use_running_average=False)
        y, muts = bn.apply(variables, jnp.asarray(x), use_running_average=False,
                           mutable=["batch_stats"])

        ddp = [torch.nn.BatchNorm1d(5), torch.nn.BatchNorm1d(5)]
        with torch.no_grad():
            y0 = ddp[0](torch.tensor(x[:4]))
            y1 = ddp[1](torch.tensor(x[4:]))
        ref = torch.cat([y0, y1]).numpy()
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)

        stats = muts["batch_stats"]["BatchNorm_0"]
        np.testing.assert_allclose(np.asarray(stats["mean"]),
                                   ddp[0].running_mean.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(stats["var"]),
                                   ddp[0].running_var.numpy(), rtol=1e-5)

    def test_grouped_bn_differs_from_global_and_matches_eval_semantics(self):
        from druglamp_tpu.nn.layers import TorchBatchNorm

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        x = x.at[:4].add(5.0)

        g1 = TorchBatchNorm(groups=1)
        g2 = TorchBatchNorm(groups=2)
        v1 = g1.init(jax.random.key(0), x, use_running_average=False)
        y1, _ = g1.apply(v1, x, use_running_average=False, mutable=["batch_stats"])
        v2 = g2.init(jax.random.key(0), x, use_running_average=False)
        y2, m2 = g2.apply(v2, x, use_running_average=False, mutable=["batch_stats"])
        assert not np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-3)

        # identical param/stat tree paths → checkpoints load across modes
        assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)

        # eval path uses the (rank-0-style) running stats, same formula as global
        ye1 = g1.apply({"params": v1["params"], "batch_stats": m2["batch_stats"]},
                       x, use_running_average=True)
        ye2 = g2.apply({"params": v2["params"], "batch_stats": m2["batch_stats"]},
                       x, use_running_average=True)
        np.testing.assert_allclose(np.asarray(ye1), np.asarray(ye2),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_full_model_per_replica_bn_dp8(self):
        """Whole-model train step with bn_groups=8 on the DP8 mesh runs and
        produces batch_stats different from global-batch mode."""
        model_g = build_model("DrugLAMP2C2P", CFG, 24, 40)
        model_r = build_model("DrugLAMP2C2P", CFG, 24, 40, bn_groups=8)
        batch = make_batch(CFG, B, n_drug_feature=24, n_prot_feature=40)
        cm_flat = build_cm_arrays(np.arange(B) % 3, np.arange(B) % 5,
                                  batch["labels"])
        # per-replica CM mining takes one gt block per batch slice
        blocks = [build_cm_arrays(np.arange(i, i + 1) % 3,
                                  np.arange(i, i + 1) % 5,
                                  batch["labels"][i : i + 1]) for i in range(B)]
        cm_grouped = {k: np.stack([b[k] for b in blocks]) for k in blocks[0]}
        batch = jax.tree.map(jnp.asarray, batch)
        variables = model_g.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            {**batch, "cm": jax.tree.map(jnp.asarray, cm_flat)},
            jax.random.key(2), method="init_all")

        ctx = MeshContext(make_mesh(1))
        outs = {}
        for name, model, cm in (("global", model_g, cm_flat),
                                ("replica", model_r, cm_grouped)):
            state = TrainState.create(
                jax.tree.map(jnp.copy, variables), use_ssl=True, use_cm=True)
            b = {**batch, "cm": jax.tree.map(jnp.asarray, cm)}
            out = _run_step(model, ctx.shard_state(state), ctx.shard_batch(b),
                            use_ssl=True, use_cm=True)
            assert np.isfinite(float(out.cls_loss)), name
            outs[name] = out
        sg = jax.tree.leaves(outs["global"].state.batch_stats)
        sr = jax.tree.leaves(outs["replica"].state.batch_stats)
        diffs = [not np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
                 for a, b in zip(sg, sr)]
        assert any(diffs), "per-replica stats identical to global stats"


def test_distributed_two_process_psum(tmp_path):
    """Real multi-process jax.distributed over gRPC on localhost: two
    processes (2 virtual CPU devices each) form one 4-device cluster via
    maybe_initialize_distributed(), build the global (data,) mesh, and
    jit a psum-backed global mean — the DCN multi-host path of SURVEY §5.8
    with actual process boundaries (the reference's closest analogue is
    Lightning DDP process forking, trainer.py:146-147)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    child = r"""
import os, sys
import numpy as np
from druglamp_tpu.parallel.distributed import (maybe_initialize_distributed,
                                               process_count, is_primary)
assert maybe_initialize_distributed()
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert process_count() == 2
assert jax.device_count() == 4            # 2 local x 2 processes
mesh = Mesh(np.array(jax.devices()), ("data",))
local = jnp.arange(2, dtype=jnp.float32) + 10 * jax.process_index()
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), (4,))
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(garr)
# values: proc0 [0,1], proc1 [10,11] -> 22
print(f"RESULT pid={jax.process_index()} total={float(total)} "
      f"primary={is_primary()}", flush=True)
"""
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = "/root/repo"
        procs.append(subprocess.Popen(
            [sys.executable, "-c", child], env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"
    results = [line for out, _ in outs for line in out.splitlines()
               if line.startswith("RESULT")]
    assert len(results) == 2
    assert all("total=22.0" in r for r in results), results
    assert sum("primary=True" in r for r in results) == 1


@pytest.mark.slow
def test_dryrun_multichip_two_processes():
    """VERDICT r4 #8: the driver-called entry itself must exercise the
    mixed DCN+ICI topology — full train step over 2 jax.distributed
    processes × 4 virtual devices (the {data:4, model:2} mesh spanning a
    process boundary), not just the single-process virtual mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8, n_processes=2)


def test_per_replica_cm_matches_independent_halves():
    """CrossModality(groups=2) == mean of two independent CM losses computed
    on the halves with shared params (the loss whose gradient torch-DDP's
    grad-averaging computes when each replica mines its local batch)."""
    from druglamp_tpu.models.cm import CrossModality

    B, T, C = 8, 6, 16
    rng = np.random.RandomState(0)
    streams = [jnp.asarray(rng.randn(B, T, C).astype(np.float32))
               for _ in range(4)]
    prot_ids = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    drug_ids = np.arange(B)
    labels = np.array([1, 0, 1, 0, 0, 0, 1, 1], np.float32)

    halves = []
    for sl in (slice(0, 4), slice(4, 8)):
        halves.append(build_cm_arrays(prot_ids[sl], drug_ids[sl], labels[sl]))
    stacked = {k: jnp.asarray(np.stack([h[k] for h in halves]))
               for k in halves[0]}

    grouped = CrossModality(hidden_size=16, groups=2)
    vars_g = grouped.init(jax.random.key(0), *streams, stacked["p_index"],
                          stacked["p_valid"], stacked["d_index"],
                          stacked["d_valid"], stacked["gt"], 0.5)
    loss_g, _ = grouped.apply(vars_g, *streams, stacked["p_index"],
                              stacked["p_valid"], stacked["d_index"],
                              stacked["d_valid"], stacked["gt"], 0.5,
                              train=True, mutable=["batch_stats"])

    single = CrossModality(hidden_size=16, groups=1)
    losses = []
    for gidx, sl in enumerate((slice(0, 4), slice(4, 8))):
        half_streams = [s[sl] for s in streams]
        h = halves[gidx]
        loss_h, _ = single.apply(
            vars_g, *half_streams, jnp.asarray(h["p_index"]),
            jnp.asarray(h["p_valid"]), jnp.asarray(h["d_index"]),
            jnp.asarray(h["d_valid"]), jnp.asarray(h["gt"]), 0.5,
            train=True, mutable=["batch_stats"])
        losses.append(float(loss_h))
    assert float(loss_g) == pytest.approx(np.mean(losses), rel=1e-5)


@pytest.mark.slow
def test_per_replica_full_dp8_runs_with_cm_groups():
    """Whole 2C2P step with bn_groups=8 + per-replica CM arrays on the DP8
    mesh: executes with finite losses."""
    model = build_model("DrugLAMP2C2P", CFG, 24, 40, bn_groups=8)
    batch = make_batch(CFG, B, n_drug_feature=24, n_prot_feature=40)
    blocks = [build_cm_arrays(np.arange(i, i + 1) % 3, np.arange(i, i + 1),
                              batch["labels"][i : i + 1]) for i in range(B)]
    batch["cm"] = {k: np.stack([b[k] for b in blocks]) for k in blocks[0]}
    batch = jax.tree.map(jnp.asarray, batch)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, jax.random.key(2), method="init_all")
    state = TrainState.create(variables, use_ssl=True, use_cm=True)
    ctx = MeshContext(make_mesh(1))
    out = _run_step(model, ctx.shard_state(state), ctx.shard_batch(batch),
                    use_ssl=True, use_cm=True)
    assert np.isfinite(float(out.cls_loss))
    assert np.isfinite(float(out.cm_loss))
