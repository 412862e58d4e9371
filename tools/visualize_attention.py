"""Export interpretability artifacts: PGCA cross-attention maps for pairs.

The reference exposes raw attention matrices via get_cross_attn_mat /
get_inter_attn_mat (basic_model.py:123-132) for downstream analysis; this
tool runs inference with ``need_attn=True`` and saves the protein→drug
attention logits per pair to an .npz.

    PYTHONPATH=. python tools/visualize_attention.py --ckpt <work_dir> \
        --model DrugLAMPwoLLM --input pairs.csv --output attn.npz
"""

from __future__ import annotations

import argparse
import csv
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--model", default="DrugLAMP")
    p.add_argument("--input", required=True, help="CSV with SMILES,Protein")
    p.add_argument("--output", required=True, help=".npz path")
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args(argv)

    from druglamp_tpu.serve import Predictor
    from druglamp_tpu.utils.jaxsetup import enable_compilation_cache

    enable_compilation_cache()
    rows = list(csv.DictReader(open(args.input)))
    pairs = [(r["SMILES"], r["Protein"]) for r in rows]
    pred = Predictor.from_checkpoint(args.ckpt, args.model,
                                     batch_size=args.batch_size)
    probs, attn = pred.predict_pairs(pairs, return_attn=True)
    np.savez_compressed(args.output, scores=probs, gca_attention=attn,
                        smiles=np.array([s for s, _ in pairs]),
                        proteins=np.array([p for _, p in pairs]))
    print(f"wrote {args.output}: scores {probs.shape}, attention {attn.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
