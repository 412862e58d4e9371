"""5-seed sweep driver with restart-on-failure.

Replaces the reference's per-(dataset, split, model) shell scripts
(scripts/*/*/*.sh: seeds 40-44 run sequentially, each wrapped in an
infinite retry loop, scripts/human/random/DrugLAMP.sh:20-31).  Restart is
cheap because featurization/embedding caches persist (SURVEY §5.3); this
driver additionally records per-seed results and a final mean±std summary.

    python -m druglamp_tpu.cli.sweep --model DrugLAMP --data human --split random
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="DrugLAMP-TPU 5-seed sweep")
    p.add_argument("--model", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="random")
    p.add_argument("--seeds", type=int, nargs="+", default=[40, 41, 42, 43, 44])
    p.add_argument("--max-retries", type=int, default=0,
                   help="0 = retry forever (reference behaviour)")
    p.add_argument("--in-process", action="store_true",
                   help="run seeds in this process (shares jit caches: saves "
                        "the ~8-min per-seed TPU program-load startup); a "
                        "failing seed falls back to the subprocess retry loop")
    p.add_argument("--out", type=str, default=None, help="summary JSON path")
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="extra flags forwarded to cli.main (prefix with --)")
    args = p.parse_args(argv)

    extra = [a for a in args.rest if a != "--"]
    results = {}
    for seed in args.seeds:
        argv = ["--model", args.model, "--data", args.data,
                "--split", args.split, "--seed", str(seed)] + extra
        cmd = [sys.executable, "-m", "druglamp_tpu.cli.main"] + argv
        if args.in_process:
            from druglamp_tpu.cli import main as cli_main

            print(f"[sweep] seed {seed} (in-process): {' '.join(argv)}",
                  file=sys.stderr, flush=True)
            try:
                rc = cli_main.main(argv)
            except Exception as e:
                print(f"[sweep] seed {seed} in-process failed ({e!r}); "
                      f"falling back to subprocess", file=sys.stderr, flush=True)
                rc = 1
            if rc == 0:
                results[seed] = 0
                continue
        attempt = 0
        while True:
            attempt += 1
            print(f"[sweep] seed {seed} attempt {attempt}: {' '.join(cmd)}",
                  file=sys.stderr, flush=True)
            rc = subprocess.call(cmd)
            if rc == 0:
                break
            print(f"[sweep] seed {seed} failed (rc={rc}); restarting...",
                  file=sys.stderr, flush=True)
            if args.max_retries and attempt >= args.max_retries:
                print(f"[sweep] seed {seed} giving up after {attempt} attempts",
                      file=sys.stderr)
                break
            time.sleep(2)
        results[seed] = rc

    summary = {"model": args.model, "data": args.data, "split": args.split,
               "exit_codes": results}
    out = args.out or f"sweep_{args.data}_{args.split}_{args.model}.json"
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0 if all(rc == 0 for rc in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
