"""Tests for optional capabilities: vis attention maps, LinAttn variant,
fast_dev_run, find_in_train_set."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from druglamp_tpu.models.registry import build_model
from tests.util import make_batch, tiny_config

CFG = tiny_config()
B = 4


def _init(model, batch):
    return model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                      batch, jax.random.key(2), method="init_all")


def test_vis_returns_pmma_attention():
    model = build_model("DrugLAMPwoLLM", CFG, 24, 40, vis=True)
    batch = jax.tree.map(jnp.asarray, make_batch(CFG, B, n_drug_feature=24,
                                                 n_prot_feature=40))
    variables = _init(model, batch)
    out = model.apply(variables, batch, train=False)
    # 4 blocks of attention maps; mm blocks also produce guided maps
    assert len(out["attn"]) == 4
    site_seq = CFG.protein.seq_len // CFG.protein.site_len
    assert out["attn"][0].shape == (B, 4, site_seq, site_seq)
    assert out["guided_attn"][0].shape == (B, 4, site_seq, site_seq)
    assert out["attn"][2].shape == (B, 4, site_seq, site_seq)
    assert out["guided_attn"][2] is None  # plain self-attn blocks


def test_linattn_variant_runs():
    model = build_model("DrugLAMPwoLLM", CFG, 24, 40, pmma_variant="linattn")
    batch = jax.tree.map(jnp.asarray, make_batch(CFG, B, n_drug_feature=24,
                                                 n_prot_feature=40))
    variables = _init(model, batch)
    out = model.apply(variables, batch, train=False)
    assert out["score"].shape == (B, 1)
    assert np.all(np.isfinite(np.asarray(out["score"])))
    # param structure differs from the default variant
    blocks = variables["params"]["pmma"]
    assert "block_2" in blocks
    assert "lin1" in blocks["block_2"]  # MHLA layer, not attention block


def test_fast_dev_run(tmp_path):
    from druglamp_tpu.config import RSConfig, SolverConfig
    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.loader import BatchLoader
    from druglamp_tpu.train.trainer import Trainer
    from tests.test_train import _make_csv_dataset

    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config(solver=SolverConfig(max_epoch=4, batch_size=4,
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
    tr = Trainer(model, cfg, mk(train), mk(val), mk(val),
                 work_dir=str(tmp_path / "fd"))
    res = tr.fast_dev_run(next(mk(train).epoch(0)), seed=0, n_batches=3)
    assert len(res["train_losses"]) == 3
    assert all(np.isfinite(l) for l in res["train_losses"])
    assert "val_auroc" in res


def test_find_in_train_set(tmp_path):
    from druglamp_tpu.data.inspect import find_in_train_set
    from tests.test_train import _make_csv_dataset

    root = _make_csv_dataset(tmp_path)
    found, cnt, idx = find_in_train_set("CCO", root, "toy", "random", "drug")
    assert found and idx >= 0
    # aromatic benzene written as Kekulé form still matches by fingerprint
    found2, _, _ = find_in_train_set(
        "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ", root, "toy", "random", "prot")
    assert found2
    missing, cnt3, idx3 = find_in_train_set("CCCCCCCCC", root, "toy", "random", "drug")
    assert not missing and idx3 == -1
    with pytest.raises(NotImplementedError):
        find_in_train_set("x", root, "toy", "random", "banana")
