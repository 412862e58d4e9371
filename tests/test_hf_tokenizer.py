"""ChemBERTa tokenizer-id fidelity for real checkpoints (r3 verdict #5).

The reference tokenizes with the checkpoint's HF BPE tokenizer (reference
handler/dataset.py:154-160); with real pretrained weights the cache's token
ids MUST index that checkpoint's embedding rows.  These tests prove:

- the HFTokenizer adapter reproduces transformers' ids exactly (encode,
  truncation, offsets);
- a real-checkpoint embed run with its own tokenizer writes caches equal to
  a direct forward with those ids;
- the silent-garbage path fails loudly (regex tokenizer + real ckpt, or a
  foreign tokenizer whose vocab exceeds the checkpoint's rows).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from druglamp_tpu.chem.hf_tokenizer import HFTokenizer, check_vocab_alignment
from druglamp_tpu.chem.tokenizer import SmilesTokenizer

# ChemBERTa-style SMILES BPE: byte-level=False vocab with one merge (CC)
_VOCAB = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4,
          "C": 5, "O": 6, "c": 7, "1": 8, "(": 9, ")": 10, "=": 11,
          "N": 12, "CC": 13}
_MERGES = ["#version: 0.2", "C C"]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chemberta_tok")
    with open(d / "vocab.json", "w") as f:
        json.dump(_VOCAB, f)
    with open(d / "merges.txt", "w") as f:
        f.write("\n".join(_MERGES) + "\n")
    hf = transformers.RobertaTokenizerFast(
        vocab_file=str(d / "vocab.json"), merges_file=str(d / "merges.txt"))
    out = d / "saved"
    hf.save_pretrained(str(out))
    return str(out)


def test_hf_tokenizer_ids_match_transformers(tok_dir):
    hf = transformers.AutoTokenizer.from_pretrained(tok_dir,
                                                    local_files_only=True)
    tok = HFTokenizer(tok_dir)
    for smi in ["CCO", "CC(=O)N", "c1ccccc1", "CCCC"]:
        assert tok.encode(smi) == hf.encode(smi), smi
    # truncation parity with HF encode(truncation=True)
    long = "C" * 40
    assert tok.encode(long, max_length=8) == hf.encode(long, truncation=True,
                                                       max_length=8)
    assert tok.vocab_size == len(hf)
    assert tok.pad_id == hf.pad_token_id
    assert tok.cls_id == hf.cls_token_id
    assert tok.sep_id == hf.sep_token_id


def test_hf_tokenizer_spans_cover_source(tok_dir):
    tok = HFTokenizer(tok_dir)
    smi = "CC(=O)N"
    spans = tok.tokenize_with_spans(smi)
    # offsets must index the original string (edge-remap contract,
    # reference utils.py:119-183)
    rebuilt = "".join(smi[a:b] for _, a, b in spans)
    assert rebuilt == smi
    # the BPE merge makes the leading "CC" a single surface token
    assert spans[0][:1] == ("CC",) and spans[0][1:] == (0, 2)


def test_extend_from_corpus_is_noop(tok_dir):
    tok = HFTokenizer(tok_dir)
    before = tok.vocab_size
    tok.extend_from_corpus(["[Na+]", "[C@@H]"])
    assert tok.vocab_size == before


def _params_with_vocab_rows(rows):
    return {"word_embeddings": {"embedding": np.zeros((rows, 8), np.float32)}}


def test_vocab_alignment_checks(tok_dir):
    tok = HFTokenizer(tok_dir)
    check_vocab_alignment(tok, _params_with_vocab_rows(len(_VOCAB)))  # fits
    with pytest.raises(ValueError, match="exceeds"):
        check_vocab_alignment(tok, _params_with_vocab_rows(len(_VOCAB) - 4))
    # the built-in regex tokenizer must be rejected with a real checkpoint
    # even when its vocab happens to fit the embedding table
    with pytest.raises(ValueError, match="regex tokenizer"):
        check_vocab_alignment(SmilesTokenizer(), _params_with_vocab_rows(4096))


def test_gen_embed_uses_checkpoint_tokenizer(tok_dir, tmp_path):
    """generate_embeddings(chemberta_ckpt=..., chemberta_tokenizer=...)
    writes drug caches equal to a direct forward on the HF tokenizer's ids —
    id alignment proven end to end."""
    import jax.numpy as jnp

    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.dataset import EntityTable, featurize_drug, featurize_prot
    from druglamp_tpu.encoders import embed_pipeline
    from druglamp_tpu.encoders.chemberta import ChemBERTa, ChemBERTaConfig
    from druglamp_tpu.encoders.convert import chemberta_params_from_torch
    import druglamp_tpu.encoders.esm2 as esm2_mod

    cfg = transformers.RobertaConfig(
        vocab_size=len(_VOCAB), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(3)
    hf_model = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()
    ckpt = str(tmp_path / "chemberta.pt")
    torch.save(hf_model.state_dict(), ckpt)

    table = EntityTable()
    smi = "CC(=O)N"
    table.drug2ord[smi] = 0
    table.drugs[0] = featurize_drug(smi, 0, 64)
    seq = "MKTAYIAK"
    table.prot2ord[seq] = 0
    table.prots[0] = featurize_prot(seq, 0, 1022, 288)

    cache = EmbeddingCache(str(tmp_path / "cache"), "toy",
                           n_drug_feature=32, n_prot_feature=64)
    cb_cfg = ChemBERTaConfig(vocab=len(_VOCAB), hidden=32, num_layers=1,
                             num_heads=4, intermediate=64, max_positions=40,
                             pad_id=1)
    small = {12: esm2_mod.ESM2Config(num_layers=2, embed_dim=64,
                                     num_heads=4, ffn_dim=256)}
    orig_sizes, orig_buckets = esm2_mod._ESM2_SIZES, embed_pipeline._BUCKETS
    try:
        esm2_mod._ESM2_SIZES = {**orig_sizes, **small}
        embed_pipeline._BUCKETS = (16,)
        embed_pipeline.generate_embeddings(
            table, cache, n_layer=12, chemberta_cfg=cb_cfg,
            chemberta_ckpt=ckpt, chemberta_tokenizer=tok_dir,
            batch=2, verbose=False)
        # same run WITHOUT the tokenizer files must refuse (silent-garbage
        # guard): the regex tokenizer's ids don't match any pretrained table
        with pytest.raises(ValueError, match="tokenizer"):
            embed_pipeline.generate_embeddings(
                table, EmbeddingCache(str(tmp_path / "c2"), "toy",
                                      n_drug_feature=32, n_prot_feature=64),
                n_layer=12, chemberta_cfg=cb_cfg, chemberta_ckpt=ckpt,
                batch=2, verbose=False)
    finally:
        esm2_mod._ESM2_SIZES = orig_sizes
        embed_pipeline._BUCKETS = orig_buckets

    ids = HFTokenizer(tok_dir).encode(smi)
    toks = np.full((1, 16), 1, np.int32)
    toks[0, :len(ids)] = ids
    params = chemberta_params_from_torch(hf_model.state_dict(), num_layers=1)
    direct = np.asarray(ChemBERTa(cb_cfg).apply({"params": params},
                                                jnp.asarray(toks)))
    np.testing.assert_allclose(cache.drug(0), direct[0, :len(ids)],
                               rtol=1e-5, atol=1e-6)
