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
    rc = sweep._run_seed(["ignored"], watchdog=2)
    assert rc == 124            # stalled run killed
    rc = sweep._run_seed(["ignored"], watchdog=2)
    assert rc == 0              # healthy run passes through

    out = tmp_path / "s.json"
    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    calls["n"] = 0
    rc = sweep.main(["--model", "M", "--data", "d", "--seeds", "7",
                     "--watchdog", "2", "--max-retries", "3",
                     "--out", str(out)])
    assert rc == 0 and calls["n"] == 2   # killed once, retried to success
