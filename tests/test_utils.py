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


def test_release_host_memory_reclaims_freelist():
    """malloc_trim must run without error and actually shrink RSS after a
    large alloc/free churn (the per-epoch trainer call relies on it)."""
    import numpy as np

    from druglamp_tpu.utils.jaxsetup import release_host_memory

    def rss_kb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1])
        return 0

    blocks = [np.ones(4 << 20, np.uint8) for _ in range(32)]  # 128 MB churn
    for b in blocks:
        b[::4096] = 2  # fault the pages in
    del blocks
    before = rss_kb()
    release_host_memory()
    after = rss_kb()
    # numpy frees large blocks via mmap already, so the delta may be small —
    # but the call must never *grow* RSS by more than noise, and must not raise
    assert after <= before + 10_000
