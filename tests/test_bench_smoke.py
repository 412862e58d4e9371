"""Driver-artifact smoke tests.

Round 1 shipped a broken dryrun_multichip; round 2 shipped a bench.py tier
that crashed on first execution (the SSL+CM tier built plain DrugLAMP, whose
forward emits cm_inputs=None — reference model/DrugLAMP.py:77 — then indexed
it).  These tests execute every driver-facing entry point in-suite so that
class of bug cannot ship unexercised again:

- every bench.py train-step tier, constructed exactly as bench.main() does
  (same model names + gate flags), on a tiny config;
- the epoch-e2e tier's embedding resolution;
- __graft_entry__.entry() forward (slow tier: full recipe shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from druglamp_tpu.utils.synthetic import tiny_config

# (model, use_ssl, use_cm) for every tier bench.main() measures — keep in
# sync with bench.main; the whole point is to execute main's constructions.
BENCH_TIERS = [
    ("DrugLAMP", False, False),
    ("DrugLAMP", True, False),
    ("DrugLAMP2C2P", True, True),
]

# fast tier keeps the SSL+CM construction (the r2 ship-broken class); the
# cheaper gate combos run in the slow tier (they share the same factory)
_TIER_PARAMS = [
    pytest.param(*BENCH_TIERS[0], marks=pytest.mark.slow),
    pytest.param(*BENCH_TIERS[1], marks=pytest.mark.slow),
    pytest.param(*BENCH_TIERS[2]),
]


@pytest.mark.parametrize("model_name,use_ssl,use_cm", _TIER_PARAMS)
def test_bench_tier_constructs_and_steps(model_name, use_ssl, use_cm):
    cfg = tiny_config()
    step, state, batch, args, model = bench.make_tier(
        model_name, use_ssl=use_ssl, use_cm=use_cm, cfg=cfg,
        batch_size=4, n_drug_feature=24, n_prot_feature=40)
    out = step(state, batch, jax.random.key(0), *args)
    assert np.isfinite(float(out.cls_loss))
    if use_ssl:
        assert np.isfinite(float(out.ssl_loss))
    if use_cm:
        assert np.isfinite(float(out.cm_loss))

    # the scanned measurement path bench.main() actually times (2 steps/scan)
    _, state, batch, args, model = bench.make_tier(
        model_name, use_ssl=use_ssl, use_cm=use_cm, cfg=cfg,
        batch_size=4, n_drug_feature=24, n_prot_feature=40)
    pps = bench._measure_step_scanned(model, use_ssl, use_cm, state, batch,
                                      args, jax.random.key(1), iters=2,
                                      reps=1, batch_size=4)
    assert pps > 0


def test_bench_main_tier_list_matches_source():
    """bench.main() must only build tiers this suite exercises (the bs64 and
    per-dispatch extras reuse the cls-tier construction)."""
    import inspect
    import re

    src = inspect.getsource(bench.main)
    models = re.findall(r'make_tier\(\s*"(\w+)"', src)
    expect = [BENCH_TIERS[0][0],                      # scanned headline
              BENCH_TIERS[0][0], BENCH_TIERS[0][0]]   # bs64 + dispatch extras
    assert models == expect, (models, expect)
    # ssl/full tiers go through step_tier with literal (model, ssl, cm) args
    gates = re.findall(r'step_tier\(\s*"(\w+)",\s*(\w+),\s*(\w+)', src)
    assert gates == [("DrugLAMP", "True", "False"),
                     ("DrugLAMP2C2P", "True", "True")], gates


def test_bench_result_json_schema():
    """Both printed lines (partial headline + enriched final) must carry the
    full schema with the driver-required keys, and skipped tiers as null."""
    import json

    line = bench._result_json(100.0, {}, ["pending"], 1.0, partial=True)
    obj = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "mfu", "skipped",
                "partial", "ssl_step_pairs_per_sec", "epoch_e2e_input"):
        assert key in obj, key
    assert obj["value"] == 100.0 and obj["partial"] is True
    assert obj["ssl_step_pairs_per_sec"] is None

    full = json.loads(bench._result_json(
        100.0, {"ssl": 50.0, "full": 25.0, "e2e": (40.0, "zero-store"),
                "e2e_dd": (60.0, "zero-store")}, [], 2.0, partial=False))
    assert full["ssl_step_pairs_per_sec"] == 50.0
    assert full["epoch_e2e_input"] == "zero-store"
    assert full["partial"] is False and full["skipped"] == []


def test_bench_e2e_dd_unsupported_fallback(tmp_path, monkeypatch):
    """The device-data e2e tier degrades to (None, reason) when the ordinal
    store is unavailable (over HBM budget → dense-LLM batches), instead of
    crashing bench.main()."""
    from druglamp_tpu.config import Config
    from druglamp_tpu.data.device_store import DeviceEmbeddingStore

    monkeypatch.setattr(bench, "CACHE_ROOT", str(tmp_path / "nope"))
    monkeypatch.setattr(bench, "E2E_ROWS", 16)
    # simulate a dataset whose store exceeds the HBM budget
    monkeypatch.setattr(DeviceEmbeddingStore, "build",
                        classmethod(lambda cls, *a, **k: None))
    pps, label = bench._measure_epoch_e2e(Config(), device_data=True)
    assert pps is None
    assert "unsupported" in label


def test_bench_e2e_embedding_resolution(tmp_path, monkeypatch):
    """_e2e_embeddings without an on-disk cache still measures the
    production ordinal-store transport (zero-filled store); plain dense
    zeros only when the store exceeds the HBM budget."""
    from druglamp_tpu.config import Config
    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.device_store import DeviceEmbeddingStore

    monkeypatch.setattr(bench, "CACHE_ROOT", str(tmp_path / "nope"))

    class T:
        n_drug = 2
        n_prot = 2
        drug2ord = {"CCO": 0, "c1ccccc1N": 1}
        prot2ord = {"MKV": 0, "A" * 2000: 1}

    emb, store, label = bench._e2e_embeddings(Config(), T())
    assert isinstance(emb, ZeroEmbeddings)
    assert store is not None and label == "zero-store"
    assert store.tree["drug_emb"].shape[0] == T.n_drug
    # advisor r3: the zero store must carry REAL token lengths, not zeros —
    # all-zero lengths mean fully-masked sequences (degenerate attention)
    drug_len = np.asarray(store.tree["drug_len"])
    prot_len = np.asarray(store.tree["prot_len"])
    assert drug_len.tolist() == [5, 11]     # CLS + tokens + SEP
    assert prot_len.tolist() == [5, 1024]   # min(len, 1022) + BOS/EOS

    monkeypatch.setattr(DeviceEmbeddingStore, "build",
                        classmethod(lambda cls, *a, **k: None))
    emb, store, label = bench._e2e_embeddings(Config(), T())
    assert store is None and label == "zeros"


def test_throughput_sweep_tool():
    """tools/throughput_sweep.py's measurement path on a tiny config (same
    ship-unexercised guard as the bench tiers)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "throughput_sweep",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "throughput_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pps = mod.sweep(4, iters=2, reps=1, cfg=tiny_config(),
                    n_drug_feature=24, n_prot_feature=40)
    assert pps > 0


@pytest.mark.slow
def test_graft_entry_forward():
    """What the driver compile-checks: entry() at full recipe shapes."""
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    score = jax.jit(fn)(*example_args)
    assert score.shape[0] == 16
    assert np.all(np.isfinite(np.asarray(score, dtype=np.float32)))


@pytest.mark.slow
def test_bench_measure_step_full_shapes():
    """One warmup+measure iteration of the headline tier at real shapes."""
    step, state, batch, args, _ = bench.make_tier("DrugLAMP", use_ssl=False,
                                                  use_cm=False)
    pps = bench._measure_step(step, state, batch, args, jax.random.key(0),
                              iters=1, warmup=1)
    assert pps > 0


def test_roofline_audit_tool():
    """tools/roofline_audit.py's compiled-cost path on a tiny config."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "roofline_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "roofline_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.audit_compiled("DrugLAMP", False, False, batch_size=4,
                             cfg=tiny_config(), n_drug_feature=24,
                             n_prot_feature=40)
    assert out["gflop_per_pair"] > 0
    assert out["roofline_ms"] > 0
    assert out["bound"] in ("flops", "bytes")


def test_flop_audit_tool():
    """tools/flop_audit.py's lowering path on a tiny config (ship-unexercised
    guard; full-shape numbers live in BASELINE.md)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "flop_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "flop_audit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.audit_tier("DrugLAMP", False, False, batch_size=4,
                         cfg=tiny_config(), n_drug_feature=24,
                         n_prot_feature=40)
    assert out["gflop_per_pair"] > 0
