"""Summarize experiment results from results/*/metrics.jsonl.

    python tools/summarize_results.py [results_dir]

Prints one row per run: best val AUSum/epoch and final test metrics.
"""

import glob
import json
import os
import sys


def summarize(results_dir: str = "results"):
    rows = []
    for path in sorted(glob.glob(os.path.join(results_dir, "*", "metrics.jsonl"))):
        name = os.path.basename(os.path.dirname(path))
        best = (float("-inf"), None)
        test = {}
        hp = {}
        for line in open(path):
            r = json.loads(line)
            if r.get("event") == "hyperparams":
                hp = r
            if "val_ausum" in r and r["val_ausum"] == r["val_ausum"]:
                if r["val_ausum"] > best[0]:
                    best = (r["val_ausum"], r.get("epoch"))
            if "test_auroc" in r:
                test = r
        rows.append((name, hp, best, test))

    for name, hp, best, test in rows:
        print(f"== {name}")
        if hp:
            print(f"   model={hp.get('model')} data={hp.get('data')} "
                  f"split={hp.get('split')} seed={hp.get('seed')} "
                  f"epochs={hp.get('max_epoch')}")
        if best[1] is not None:
            print(f"   best val_ausum {best[0]:.5f} @ epoch {best[1]}")
        if test:
            keys = ["test_auroc", "test_auprc", "test_acc", "test_sn",
                    "test_sp", "test_f1", "test_pr"]
            print("   " + " ".join(f"{k.replace('test_', '')}={test[k]:.4f}"
                                   for k in keys if k in test))
    return rows


if __name__ == "__main__":
    summarize(sys.argv[1] if len(sys.argv) > 1 else "results")
