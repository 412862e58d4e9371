"""CLI-surface tests (arg handling; no heavy training)."""

import json
import sys
from unittest import mock

import pytest


def test_main_rejects_unknown_model(capsys):
    from druglamp_tpu.cli.main import main

    rc = main(["--model", "Nope", "--data", "human"])
    assert rc == 2
    assert "available" in capsys.readouterr().err


def test_main_split_choices():
    from druglamp_tpu.cli.main import build_argparser

    p = build_argparser()
    with pytest.raises(SystemExit):
        p.parse_args(["--model", "DrugLAMP", "--data", "human",
                      "--split", "bogus"])
    args = p.parse_args(["--model", "DrugLAMP", "--data", "human",
                         "--split", "Tcpi", "--n-layer", "12"])
    assert args.split == "Tcpi" and args.n_layer == 12


def test_sweep_retries_and_summary(tmp_path, monkeypatch):
    from druglamp_tpu.cli import sweep

    calls = []

    def fake_call(cmd):
        calls.append(cmd)
        # first seed fails once, then succeeds
        seed = cmd[cmd.index("--seed") + 1]
        if seed == "40" and sum(1 for c in calls
                                if c[c.index("--seed") + 1] == "40") == 1:
            return 1
        return 0

    monkeypatch.setattr(sweep.subprocess, "call", fake_call)
    monkeypatch.setattr(sweep.time, "sleep", lambda s: None)
    out = tmp_path / "summary.json"
    rc = sweep.main(["--model", "DrugLAMP", "--data", "human",
                     "--seeds", "40", "41", "--out", str(out)])
    assert rc == 0
    summary = json.loads(out.read_text())
    assert summary["exit_codes"] == {"40": 0, "41": 0} or \
        summary["exit_codes"] == {40: 0, 41: 0}
    # seed 40 ran twice (retry), 41 once
    seeds = [c[c.index("--seed") + 1] for c in calls]
    assert seeds == ["40", "40", "41"]


def test_sweep_max_retries(monkeypatch, tmp_path):
    from druglamp_tpu.cli import sweep

    monkeypatch.setattr(sweep.subprocess, "call", lambda cmd: 1)
    monkeypatch.setattr(sweep.time, "sleep", lambda s: None)
    rc = sweep.main(["--model", "DrugLAMP", "--data", "human",
                     "--seeds", "40", "--max-retries", "3",
                     "--out", str(tmp_path / "s.json")])
    assert rc == 1


def test_resolve_split_files_rs_wiring(tmp_path, capsys):
    """RS-task (cluster/Tcpi) wiring: source_train + target_test for both
    eval loaders (reference main.py:67-68,81-83,138-153), with the
    target_train fallback for checkouts shipping no source_train."""
    import os

    from druglamp_tpu.cli.main import resolve_split_files

    assert resolve_split_files("/x", "human", "random", False) == (
        "train.csv", "val.csv", "test.csv")

    d = tmp_path / "biosnap" / "cluster"
    os.makedirs(d)
    (d / "target_train.csv").write_text("SMILES,Protein,Y\n")
    (d / "target_test.csv").write_text("SMILES,Protein,Y\n")
    got = resolve_split_files(str(tmp_path), "biosnap", "cluster", True)
    assert got == ("target_train.csv", "target_test.csv", "target_test.csv")
    assert "source_train.csv missing" in capsys.readouterr().err

    (d / "source_train.csv").write_text("SMILES,Protein,Y\n")
    got = resolve_split_files(str(tmp_path), "biosnap", "cluster", True)
    assert got == ("source_train.csv", "target_test.csv", "target_test.csv")


def test_eval_only_requires_ckpt(capsys):
    from druglamp_tpu.cli.main import main

    rc = main(["--model", "DrugLAMPwoLLM", "--data", "human",
               "--split", "random", "--eval-only"])
    assert rc == 2
    assert "--ckpt" in capsys.readouterr().err


def test_sweep_watchdog_kills_stalled_run(tmp_path, monkeypatch):
    """--watchdog kills a seed whose output goes quiet and retries it
    (wedged remote-TPU connection recovery, cli/sweep._run_seed)."""
    import subprocess
    import sys as _sys

    from druglamp_tpu.cli import sweep

    calls = {"n": 0}
    real_popen = subprocess.Popen

    def fake_popen(cmd, stdout=None, stderr=None):
        calls["n"] += 1
        if calls["n"] == 1:
            # first attempt: writes once, then hangs silently
            script = "import sys,time;print('x',flush=True);time.sleep(60)"
        else:
            script = "print('ok')"
        return real_popen([_sys.executable, "-c", script],
                          stdout=stdout, stderr=stderr)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    ld = str(tmp_path / "wdlogs")
    rc = sweep._run_seed(["ignored"], watchdog=2, log_dir=ld)
    assert rc == 124            # stalled run killed
    # failure log persisted for postmortems (advisor r2)
    import os as _os
    assert any(f.endswith(".log") for f in _os.listdir(ld))
    rc = sweep._run_seed(["ignored"], watchdog=2, log_dir=ld)
    assert rc == 0              # healthy run passes through
    # success logs are cleaned up (only the failure log remains)
    assert len(_os.listdir(ld)) == 1

    out = tmp_path / "s.json"
    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    calls["n"] = 0
    rc = sweep.main(["--model", "M", "--data", "d", "--seeds", "7",
                     "--watchdog", "2", "--max-retries", "3",
                     "--out", str(out)])
    assert rc == 0 and calls["n"] == 2   # killed once, retried to success


def test_sweep_watchdog_grace_covers_silent_startup(tmp_path, monkeypatch):
    """A child that is silent longer than the watchdog BEFORE its first
    output survives (startup/compile/embed-gen grace, advisor r2); the
    steady-state threshold only applies after output begins."""
    import subprocess
    import sys as _sys

    from druglamp_tpu.cli import sweep

    real_popen = subprocess.Popen

    def fake_popen(cmd, stdout=None, stderr=None):
        # silent for 4s (>> watchdog=1), then prints and exits cleanly
        script = "import time;time.sleep(4);print('late ok',flush=True)"
        return real_popen([_sys.executable, "-c", script],
                          stdout=stdout, stderr=stderr)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    rc = sweep._run_seed(["ignored"], watchdog=1, grace=120,
                         log_dir=str(tmp_path / "wdlogs"))
    assert rc == 0


def test_eval_only_refuses_zero_embeddings(tmp_path, capsys):
    """--eval-only on an LLM-stream model with missing embedding caches must
    exit non-zero instead of silently scoring on zeros (VERDICT r2 #7);
    --allow-zero-embeddings is the explicit escape hatch."""
    import os

    from druglamp_tpu.cli.main import main

    # tiny dataset: reuse the shipped human/random test.csv via cutoff
    ckpt = tmp_path / "ckpt_best"
    ckpt.mkdir()
    rc = main(["--model", "DrugLAMP", "--data", "human", "--split", "random",
               "--eval-only", "--ckpt", str(ckpt), "--cutoff", "8",
               "--work-dir", str(tmp_path / "work")])
    assert rc == 3
    assert "--allow-zero-embeddings" in capsys.readouterr().err


def test_cache_dir_namespaced_by_ordinal_scope(tmp_path):
    """Split-union fallback ordinals are split-local, so the embedding cache
    must be namespaced per split (a human/cold run must never read
    human/random's ordinal-keyed cache); full.csv ordinals are split-stable
    and share one cache per dataset (reference dataset.py:92-98)."""
    from types import SimpleNamespace

    from druglamp_tpu.cli.main import _cache_dir

    args = SimpleNamespace(work_dir=None, data="human")
    t_random = SimpleNamespace(ordinal_scope="random")
    t_cold = SimpleNamespace(ordinal_scope="cold")
    t_full = SimpleNamespace(ordinal_scope="full")
    wd = str(tmp_path / "results" / "exp1")
    d_random = _cache_dir(args, wd, t_random)
    d_cold = _cache_dir(args, wd, t_cold)
    d_full = _cache_dir(args, wd, t_full)
    assert d_random != d_cold
    assert d_random.endswith("human-random")
    assert d_cold.endswith("human-cold")
    assert d_full.endswith("human")
    # explicit --work-dir keeps the cache inside it regardless of scope
    args2 = SimpleNamespace(work_dir="/w", data="human")
    assert _cache_dir(args2, "/w", t_cold) == "/w/embed_cache"


def test_gen_embed_only_exits_before_training(tmp_path, monkeypatch, capsys):
    """--gen-embed-only populates the cache for the training entity table and
    exits 0 without building a model or training (cache warm-up path used to
    pre-generate sweep/bench caches)."""
    from druglamp_tpu.cli.main import main
    from druglamp_tpu.encoders import embed_pipeline

    calls = []

    def fake_generate(table, cache, **kw):
        calls.append((table.n_drug, table.n_prot))

    monkeypatch.setattr(embed_pipeline, "generate_embeddings", fake_generate)

    rc = main(["--model", "DrugLAMPwoLLM", "--data", "human",
               "--split", "random", "--gen-embed-only", "--cutoff", "8",
               "--work-dir", str(tmp_path / "work")])
    assert rc == 0
    assert len(calls) == 1 and calls[0][0] > 0 and calls[0][1] > 0
    assert "gen-embed-only" in capsys.readouterr().out
    # no training artifacts: the trainer never ran
    assert not (tmp_path / "work" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_cli_train_tiny_device_data(tmp_path):
    """Full cli.main training invocation (logger, store build, trainer,
    test eval) at tiny --config shapes with --device-data on — locks the
    whole flag wiring (a device_data-before-definition bug shipped once
    because no fast test drove main() through the logger)."""
    from druglamp_tpu.cli.main import main as cli_main

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        "DRUG:\n  MAX_NODES: 64\n"
        "PROTEIN:\n  SEQ_LEN: 288\n  SITE_LEN: 9\n"
        "SOLVER:\n  BATCH_SIZE: 4\n  MAX_EPOCH: 1\n  LR: 1e-4\n"
        "  SSL_LR: 3e-5\n  CM_LR: 1e-5\n  SEED: 1\n"
        "RS:\n  SSL: False\n  CM: False\n"
        "DECODER:\n  BINARY: 1\n")
    rc = cli_main(["--model", "DrugLAMPwoLLM", "--data", "human",
                   "--split", "random", "--seed", "1", "--cutoff", "16",
                   "--config", str(cfg_path), "--device-data", "on",
                   "--work-dir", str(tmp_path / "w"),
                   "--data-root", "/root/reference/datasets"])
    assert rc == 0
    metrics = (tmp_path / "w" / "metrics.jsonl").read_text().splitlines()
    assert any('"event": "done"' in l for l in metrics)
    assert any('"device_data": true' in l for l in metrics)
    # --work-dir runs must not create a results/ cell
    import glob

    assert not glob.glob("results/human-random-DrugLAMPwoLLM-seed1-*")


def test_write_eval_record_artifact(tmp_path):
    """--eval-only must leave a results/ metrics.jsonl artifact (stdout-only
    eval records live in untracked logs/ and die with workspace resets)."""
    import json as _json
    from types import SimpleNamespace

    from druglamp_tpu.cli.main import write_eval_record

    args = SimpleNamespace(data="bindingdb", split="cluster",
                           model="DrugLAMP2C2P", seed=42, ckpt=str(tmp_path))
    rec = {"test_auroc": 0.5, "test_auprc": 0.5}
    out_dir = write_eval_record(args, rec, n_rows=907,
                                results_root=str(tmp_path / "results"))
    lines = [_json.loads(l) for l in
             open(f"{out_dir}/metrics.jsonl").read().splitlines()]
    assert lines[0]["event"] == "eval_only"
    assert lines[0]["n_rows"] == 907
    assert lines[1] == rec
