"""Logging + profiling utility tests."""

import json
import os

import numpy as np


def test_experiment_logger_jsonl(tmp_path):
    from druglamp_tpu.utils.logging import ExperimentLogger

    lg = ExperimentLogger(str(tmp_path), "exp1", hyperparams={"lr": 1e-4},
                          quiet=True)
    lg.log_metrics({"loss": 0.5, "auroc": np.float32(0.9)}, epoch=1)
    lg.log_dict({"event": "done"})
    lg.close()
    lines = [json.loads(l) for l in open(lg.jsonl_path)]
    assert lines[0]["event"] == "hyperparams"
    assert lines[1]["epoch"] == 1 and lines[1]["loss"] == 0.5
    assert abs(lines[1]["auroc"] - 0.9) < 1e-6
    assert lines[2]["event"] == "done"


def test_step_timer():
    import time

    from druglamp_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(5):
        t.start()
        time.sleep(0.002)
        t.stop()
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_ms"] >= 2.0
    assert s["p50_ms"] <= s["max_ms"]


def test_jaxsetup_cache_dir(tmp_path, monkeypatch):
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    d = tmp_path / "cache"
    enable_compilation_cache(str(d))
    assert os.path.isdir(d)
