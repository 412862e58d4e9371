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
