"""Serving API + predict CLI tests (tiny config, CPU)."""

import csv
import os

import numpy as np
import pytest

import jax

from druglamp_tpu.models.registry import build_model
from druglamp_tpu.serve import Predictor
from tests.util import tiny_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A minimal checkpoint written via the Trainer machinery."""
    from druglamp_tpu.config import RSConfig, SolverConfig
    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.train.trainer import Trainer
    from tests.test_train import _make_csv_dataset

    tmp = tmp_path_factory.mktemp("serve")
    root = _make_csv_dataset(tmp)
    cfg = tiny_config(solver=SolverConfig(max_epoch=1, batch_size=4,
                                          compute_dtype="float32"),
                      rs=RSConfig(ssl=False, cm=False))
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    train = DTIDataset(root, "toy", "random", "train.csv", **kw)
    val = DTIDataset(root, "toy", "random", "val.csv", table=train.table, **kw)
    emb = ZeroEmbeddings(24, 40)
    mk = lambda ds: BatchLoader(ds, 4, shuffle=False, drop_last=True,
                                embeddings=emb, prefetch=0)
    model = build_model("DrugLAMPwoLLM", cfg, 24, 40)
    wd = str(tmp / "work")
    tr = Trainer(model, cfg, mk(train), mk(val), mk(val), work_dir=wd)
    tr.run_experiment(next(mk(train).epoch(0)), seed=1)
    return wd, cfg


def test_predictor_scores_pairs(trained):
    wd, cfg = trained
    pred = Predictor.from_checkpoint(wd, "DrugLAMPwoLLM", cfg=cfg,
                                     n_drug_feature=24, n_prot_feature=40,
                                     batch_size=4)
    pairs = [("CCO", "MKTAYIAKQR"), ("c1ccccc1", "MSEQNNTEMT"),
             ("CC(=O)O", "MAHHH"), ("CCN", "MKTAYIAKQR"), ("C1CCCCC1", "MSEQ")]
    probs = pred.predict_pairs(pairs)
    assert probs.shape == (5,)
    assert np.all((probs >= 0) & (probs <= 1))
    # deterministic
    probs2 = pred.predict_pairs(pairs)
    np.testing.assert_allclose(probs, probs2)


def test_predictor_attention_maps(trained):
    wd, cfg = trained
    pred = Predictor.from_checkpoint(wd, "DrugLAMPwoLLM", cfg=cfg,
                                     n_drug_feature=24, n_prot_feature=40,
                                     batch_size=2)
    probs, attn = pred.predict_pairs([("CCO", "MKTAYIAK")], return_attn=True)
    site_seq = cfg.protein.seq_len // cfg.protein.site_len
    assert attn.shape == (1, 1, site_seq, cfg.drug.max_nodes)


def test_predict_cli(trained, tmp_path):
    wd, cfg = trained
    inp = tmp_path / "pairs.csv"
    with open(inp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["SMILES", "Protein"])
        w.writeheader()
        w.writerow({"SMILES": "CCO", "Protein": "MKTAYIAK"})
        w.writerow({"SMILES": "c1ccccc1", "Protein": "MSEQNNT"})
    out = tmp_path / "scores.csv"

    import druglamp_tpu.cli.predict as predict_cli
    from druglamp_tpu import serve

    orig = serve.Predictor.from_checkpoint

    def patched(work_dir, model_name="DrugLAMP", cfg_arg=None, which="best", **kw):
        return orig(work_dir, model_name, cfg=cfg, which=which,
                    n_drug_feature=24, n_prot_feature=40,
                    batch_size=kw.get("batch_size", 32))

    serve.Predictor.from_checkpoint = patched
    try:
        rc = predict_cli.main(["--ckpt", wd, "--model", "DrugLAMPwoLLM",
                               "--input", str(inp), "--output", str(out)])
    finally:
        serve.Predictor.from_checkpoint = orig
    assert rc == 0
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 2
    assert all(0.0 <= float(r["score"]) <= 1.0 for r in rows)
