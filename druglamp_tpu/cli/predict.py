"""Batch scoring CLI.

    python -m druglamp_tpu.cli.predict --ckpt results/run --model DrugLAMPwoLLM \
        --input pairs.csv --output scores.csv

Input CSV needs SMILES and Protein columns; output adds a `score` column.
"""

from __future__ import annotations

import argparse
import csv
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="DrugLAMP-TPU batch inference")
    p.add_argument("--ckpt", required=True, help="work dir containing ckpt_best")
    p.add_argument("--model", default="DrugLAMP")
    p.add_argument("--which", default="best", choices=["best", "last"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args(argv)

    from druglamp_tpu.serve import Predictor
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()

    with open(args.input) as f:
        rows = list(csv.DictReader(f))
    if not rows:
        print("error: empty input", file=sys.stderr)
        return 2
    missing = {"SMILES", "Protein"} - set(rows[0].keys())
    if missing:
        print(f"error: input CSV missing column(s): {', '.join(sorted(missing))}",
              file=sys.stderr)
        return 2
    pairs = [(r["SMILES"], r["Protein"]) for r in rows]

    predictor = Predictor.from_checkpoint(args.ckpt, args.model, which=args.which,
                                          batch_size=args.batch_size)
    probs = predictor.predict_pairs(pairs)

    fieldnames = list(rows[0].keys()) + ["score"]
    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        for row, s in zip(rows, probs):
            w.writerow({**row, "score": f"{float(s):.6f}"})
    print(f"scored {len(rows)} pairs -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
