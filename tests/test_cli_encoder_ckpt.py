"""End-to-end CLI proof of the checkpoint-loaded encoder path (VERDICT r4 #6).

Runs the REAL CLI (``druglamp_tpu.cli.main``) with ``--gen-embed --esm-ckpt
--chemberta-ckpt --chemberta-tokenizer`` on synthetic-weight HF-format
checkpoint files at the true production geometries (ESM-2 t12 = 12 layers /
480 dim, ChemBERTa-77M-MTR = 3 layers / 384 dim), through cache generation,
2 training epochs and the test eval — the full flow real pretrained weights
will ride (reference main.py:77-87 first-seed gen_embed + handler/
dataset.py:138-171 per-entity caches).  Nothing here monkeypatches pipeline
internals; the only test seams are the tiny dataset CSVs and the random
weights inside the HF-format files.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

AMINO = "ACDEFGHIKLMNPQRSTVWY"
SMILES = ["CCO", "c1ccccc1", "CCN", "CC(=O)O", "CCCC", "C1CCCCC1",
          "CC(C)O", "CCOC", "CCS"]


def _write_dataset(root):
    """human/random with 36 train rows (2 steps/epoch at bs 16, drop_last)."""
    rng = np.random.RandomState(0)
    prots = ["".join(rng.choice(list(AMINO), 48)) for _ in range(4)]
    rows = [(d, p) for d in SMILES for p in prots]          # 36 pairs
    d = os.path.join(root, "human", "random")
    os.makedirs(d)
    def dump(name, pairs):
        with open(os.path.join(d, name), "w") as f:
            f.write(",SMILES,Protein,Y\n")
            for i, (smi, prot) in enumerate(pairs):
                f.write(f"{i},{smi},{prot},{i % 2}\n")
    dump("train.csv", rows)
    dump("val.csv", rows[:6])
    dump("test.csv", rows[6:12])


def _write_esm_ckpt(path):
    """HF-format ESM-2 at the exact t12 geometry (encoders/esm2.py:66)."""
    cfg = transformers.EsmConfig(
        vocab_size=33, mask_token_id=32, pad_token_id=1,
        hidden_size=480, num_hidden_layers=12, num_attention_heads=20,
        intermediate_size=1920, position_embedding_type="rotary",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        emb_layer_norm_before=False, token_dropout=True,
        layer_norm_eps=1e-5, max_position_embeddings=1026)
    torch.manual_seed(0)
    model = transformers.EsmModel(cfg, add_pooling_layer=False).eval()
    torch.save(model.state_dict(), path)


def _write_chemberta_ckpt(path):
    """HF-format RoBERTa at the ChemBERTa-77M-MTR geometry the pipeline's
    default config expects (encoders/chemberta.py:26-34)."""
    cfg = transformers.RobertaConfig(
        vocab_size=600, hidden_size=384, num_hidden_layers=3,
        num_attention_heads=12, intermediate_size=464,
        max_position_embeddings=515, pad_token_id=1, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12)
    torch.manual_seed(1)
    model = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()
    torch.save(model.state_dict(), path)


def _write_tokenizer_dir(path):
    """A real HF RoBERTa BPE tokenizer dir (vocab.json + merges.txt): the
    byte-level base alphabet with no merges, so every SMILES character is
    one token.  Loads as RobertaTokenizerFast → offset mappings work."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    os.makedirs(path)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for ch in bytes_to_unicode().values():
        if ch not in vocab:
            vocab[ch] = len(vocab)
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "RobertaTokenizer",
                   "model_max_length": 512}, f)


@pytest.mark.slow
def test_cli_gen_embed_trains_from_ckpt_files(tmp_path):
    data_root = str(tmp_path / "datasets")
    work_dir = str(tmp_path / "work")
    esm_ckpt = str(tmp_path / "esm2_t12.pt")
    cb_ckpt = str(tmp_path / "chemberta.pt")
    tok_dir = str(tmp_path / "tokenizer")
    _write_dataset(data_root)
    _write_esm_ckpt(esm_ckpt)
    _write_chemberta_ckpt(cb_ckpt)
    _write_tokenizer_dir(tok_dir)

    from druglamp_tpu.cli.main import main

    rc = main(["--model", "DrugLAMP", "--data", "human", "--split", "random",
               "--seed", "42", "--n-layer", "12", "--max_epoch", "2",
               "--gen-embed", "--esm-ckpt", esm_ckpt,
               "--chemberta-ckpt", cb_ckpt, "--chemberta-tokenizer", tok_dir,
               "--data-root", data_root, "--work-dir", work_dir,
               "--eval-batch-size", "8", "--no-comet"])
    assert rc == 0

    # terminal done event + real test metrics in the run log
    events = [json.loads(l) for l in
              open(os.path.join(work_dir, "metrics.jsonl"))]
    assert any(e.get("event") == "done" for e in events)
    test_ev = [e for e in events if "test_auroc" in e]
    assert test_ev and np.isfinite(test_ev[-1]["test_auroc"])
    # provenance: the resolved train CSV is recorded (VERDICT r4 #3)
    hp = [e for e in events if e.get("event") == "hyperparams"]
    assert hp and hp[0]["train_csv"] == "train.csv"
    # LLM-dim sidecar for n_layer 12
    assert open(os.path.join(work_dir, "12_layers_params.txt")).read() \
        .split() == ["384", "480"]

    # caches exist, are finite, and came FROM the checkpoint weights — the
    # cached protein embedding equals a direct Flax forward with params
    # converted from the very file the CLI loaded (not random-init fallback)
    import jax.numpy as jnp
    import ml_dtypes

    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.encoders.convert import esm2_params_from_torch
    from druglamp_tpu.encoders.esm2 import ESM2, esm2_config_for_layers, esm_tokenize
    from druglamp_tpu.encoders.embed_pipeline import load_torch_state_dict

    ds = DTIDataset(data_root, "human", "random", "train.csv",
                    max_nodes=512, seq_len=2304, max_prot_resis=1022)
    cache = EmbeddingCache(os.path.join(work_dir, "embed_cache"), "human",
                           384, 480, dtype=ml_dtypes.bfloat16)
    seq, ordn = next(iter(ds.table.prot2ord.items()))
    assert all(cache.has_prot(o) for o in ds.table.prot2ord.values())
    assert all(cache.has_drug(o) for o in ds.table.drug2ord.values())
    got = np.asarray(cache.prot(ordn), np.float32)
    assert np.isfinite(got).all() and np.abs(got).max() > 0

    esm = ESM2(esm2_config_for_layers(12))
    params = esm2_params_from_torch(load_torch_state_dict(esm_ckpt),
                                    num_layers=12)
    toks = jnp.asarray(esm_tokenize(seq, 1022)[None, :])
    want = np.asarray(esm.apply({"params": params}, toks))[0, :got.shape[0]]
    # one bf16-ulp band: the cache pipeline computes under jit (batched,
    # padded) whose fusion order rounds differently than this eager fp32
    # reference BEFORE the bf16 cast — measured max diff is exactly one ulp
    # (0.0078 at |x|max 3.3); anything larger would mean wrong weights
    np.testing.assert_allclose(
        got, want.astype(ml_dtypes.bfloat16).astype(np.float32),
        rtol=0, atol=0.016)
