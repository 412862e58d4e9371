"""Frozen-encoder numerics: Flax ESM-2 / ChemBERTa vs HF torch reference.

transformers is installed (no network needed): instantiate small random HF
models, convert their weights, and compare outputs elementwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from druglamp_tpu.encoders.chemberta import ChemBERTa, ChemBERTaConfig
from druglamp_tpu.encoders.convert import chemberta_params_from_torch, esm2_params_from_torch
from druglamp_tpu.encoders.esm2 import ESM2, ESM2Config, ESM_PAD, esm_tokenize


@pytest.fixture(scope="module")
def hf_esm():
    cfg = transformers.EsmConfig(
        vocab_size=33, mask_token_id=32, pad_token_id=1,
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, position_embedding_type="rotary",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        emb_layer_norm_before=False, token_dropout=True,
        layer_norm_eps=1e-5, max_position_embeddings=128)
    torch.manual_seed(0)
    model = transformers.EsmModel(cfg, add_pooling_layer=False).eval()
    return model


def test_esm2_matches_hf(hf_esm):
    tokens = np.array([
        esm_tokenize("MKTAYIAK", None).tolist() + [ESM_PAD] * 2,
        esm_tokenize("LAGVSERTIDPK", None).tolist()[:12],
    ], dtype=np.int32)
    attn_mask = (tokens != ESM_PAD).astype(np.int64)
    with torch.no_grad():
        ref = hf_esm(input_ids=torch.tensor(tokens.astype(np.int64)),
                     attention_mask=torch.tensor(attn_mask)).last_hidden_state.numpy()

    cfg = ESM2Config(num_layers=2, embed_dim=64, num_heads=4, ffn_dim=256)
    model = ESM2(cfg)
    params = esm2_params_from_torch(hf_esm.state_dict(), num_layers=2)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))

    valid = attn_mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-4, atol=2e-5)


def test_esm2_jit_and_batch_invariance(hf_esm):
    cfg = ESM2Config(num_layers=2, embed_dim=64, num_heads=4, ffn_dim=256)
    model = ESM2(cfg)
    params = esm2_params_from_torch(hf_esm.state_dict(), num_layers=2)
    t1 = np.array([esm_tokenize("MKTAYIAK")], np.int32)
    # same sequence padded into a longer buffer → same values on real rows
    t2 = np.full((1, 16), ESM_PAD, np.int32)
    t2[0, :10] = t1[0]
    f = jax.jit(lambda t: model.apply({"params": params}, t))
    o1 = np.asarray(f(jnp.asarray(t1)))
    o2 = np.asarray(f(jnp.asarray(t2)))
    np.testing.assert_allclose(o1[0], o2[0, :10], rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def hf_roberta():
    cfg = transformers.RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-12)
    torch.manual_seed(1)
    return transformers.RobertaModel(cfg, add_pooling_layer=False).eval()


def test_chemberta_matches_hf(hf_roberta):
    tokens = np.array([[0, 10, 11, 12, 2, 1, 1, 1],
                       [0, 20, 21, 22, 23, 24, 25, 2]], dtype=np.int32)
    attn = (tokens != 1).astype(np.int64)
    with torch.no_grad():
        ref = hf_roberta(input_ids=torch.tensor(tokens.astype(np.int64)),
                         attention_mask=torch.tensor(attn)).last_hidden_state.numpy()

    cfg = ChemBERTaConfig(vocab=100, hidden=32, num_layers=2, num_heads=4,
                          intermediate=64, max_positions=40, pad_id=1)
    model = ChemBERTa(cfg)
    params = chemberta_params_from_torch(hf_roberta.state_dict(), num_layers=2)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(tokens)))
    valid = attn.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-4, atol=2e-5)


def test_embed_pipeline_smoke(tmp_path):
    """End-to-end cache generation with tiny random encoders."""
    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.dataset import EntityTable, featurize_drug, featurize_prot
    from druglamp_tpu.encoders import embed_pipeline

    # tiny ESM config so the random encoder is fast
    embed_pipeline_sizes = embed_pipeline.esm2_config_for_layers
    table = EntityTable()
    for i, smi in enumerate(["CCO", "c1ccccc1", "CCN"]):
        table.drug2ord[smi] = i
        table.drugs[i] = featurize_drug(smi, i, 64)
    for i, seq in enumerate(["MKTAYIAK", "LAGVSERTID"]):
        table.prot2ord[seq] = i
        table.prots[i] = featurize_prot(seq, i, 1022, 288)

    cache = EmbeddingCache(str(tmp_path), "toy", n_drug_feature=32, n_prot_feature=64)
    import druglamp_tpu.encoders.esm2 as esm2_mod

    cfg_small = {12: esm2_mod.ESM2Config(num_layers=1, embed_dim=64, num_heads=4,
                                         ffn_dim=64)}
    orig = esm2_mod._ESM2_SIZES
    try:
        embed_pipeline._BUCKETS = (16, 32, 64)
        embed_pipeline._DRUG_BUCKETS = (16, 32, 64)
        _orig_buckets = ((1032,), (520,))
        esm2_mod._ESM2_SIZES = {**orig, **cfg_small}
        from druglamp_tpu.encoders.chemberta import ChemBERTaConfig

        embed_pipeline.generate_embeddings(
            table, cache, n_layer=12,
            chemberta_cfg=ChemBERTaConfig(vocab=64, hidden=32, num_layers=1,
                                          num_heads=4, intermediate=32,
                                          max_positions=64),
            batch=2, verbose=False)
    finally:
        esm2_mod._ESM2_SIZES = orig
        embed_pipeline._BUCKETS, embed_pipeline._DRUG_BUCKETS = _orig_buckets

    for i in range(3):
        emb = cache.drug(i)
        assert emb.shape[1] == 32
        assert emb.shape[0] >= 3  # CLS + tokens + SEP
        assert np.isfinite(emb).all()
    for i, seq in enumerate(["MKTAYIAK", "LAGVSERTID"]):
        emb = cache.prot(i)
        assert emb.shape == (len(seq) + 2, 64)
        assert np.isfinite(emb).all()


def test_esm2_tensor_parallel_sharding():
    """ESM params shard over the model axis; sharded forward == unsharded."""
    from druglamp_tpu.encoders.sharding import shard_encoder_variables
    from druglamp_tpu.parallel.mesh import make_mesh

    cfg = ESM2Config(num_layers=2, embed_dim=64, num_heads=4, ffn_dim=256)
    model = ESM2(cfg)
    tokens = jnp.asarray(np.array([esm_tokenize("MKTAYIAKLAGV")], np.int32))
    variables = model.init(jax.random.key(0), tokens)
    ref = np.asarray(model.apply(variables, tokens))

    mesh = make_mesh(n_model=2)
    sharded = shard_encoder_variables(variables, mesh)
    # at least one kernel is actually split over 'model'
    import flax.linen as nn_linen

    leaves = jax.tree.leaves(sharded,
                             is_leaf=lambda x: isinstance(x, nn_linen.Partitioned))
    specs = set()
    for leaf in leaves:
        val = leaf.value if isinstance(leaf, nn_linen.Partitioned) else leaf
        specs.add(str(getattr(val, "sharding", None).spec)
                  if hasattr(val, "sharding") else "none")
    assert any("model" in s for s in specs), specs

    out = jax.jit(lambda v, t: model.apply(v, t))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_esm2_15b_tp_fits_per_chip_hbm():
    """TP at the motivating scale (VERDICT item 7): esm2_t48_15B param tree
    sharded over model=8 must fit a v5e chip's HBM per device.  Shapes come
    from jax.eval_shape (no allocation); placement from the same logical
    rules the live path uses."""
    import flax.linen as nn
    from jax.sharding import PartitionSpec as P

    from druglamp_tpu.encoders.esm2 import ESM2, esm2_config_for_layers
    from druglamp_tpu.encoders.sharding import LOGICAL_RULES
    from druglamp_tpu.parallel.mesh import make_mesh

    cfg = esm2_config_for_layers(48)          # 5120 dim, 48 layers ≈ 15B
    assert cfg.embed_dim == 5120
    model = ESM2(cfg, dtype=jnp.bfloat16)
    abstract = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32)),
        jax.random.key(0))
    mesh = make_mesh(n_model=8)
    logical = nn.get_partition_spec(abstract)
    shardings = nn.logical_to_mesh_sharding(logical, mesh, LOGICAL_RULES)

    n_model = mesh.shape["model"]
    total = sharded = 0
    per_device = 0.0
    qkv_sharded = ffn_sharded = 0
    for (path, leaf), (_, s) in zip(
            jax.tree_util.tree_flatten_with_path(
                abstract, is_leaf=lambda x: isinstance(x, nn.Partitioned))[0],
            jax.tree_util.tree_flatten_with_path(
                shardings, is_leaf=lambda x: x is None or hasattr(x, "spec"))[0]):
        val = leaf.value if isinstance(leaf, nn.Partitioned) else leaf
        nbytes = int(np.prod(val.shape)) * val.dtype.itemsize
        total += nbytes
        spec = getattr(s, "spec", P())
        if any(ax == "model" for ax in spec):
            sharded += nbytes
            per_device += nbytes / n_model
            pstr = jax.tree_util.keystr(path)
            if any(p in pstr for p in ("q_proj", "k_proj", "v_proj", "out_proj")):
                qkv_sharded += 1
            if "fc1" in pstr or "fc2" in pstr:
                ffn_sharded += 1
        else:
            per_device += nbytes

    assert total > 25e9, f"t48 should be ≈15B params bf16, got {total/1e9:.1f}GB"
    assert sharded / total > 0.95, "most of the stack must shard over 'model'"
    assert qkv_sharded >= 4 * 48 and ffn_sharded >= 2 * 48, (
        qkv_sharded, ffn_sharded)
    V5E_HBM = 16e9
    assert per_device < V5E_HBM * 0.5, (
        f"per-device {per_device/1e9:.1f}GB must leave headroom on a 16GB chip")


def test_esm2_tp_real_kernels_at_5120():
    """One real t48-shaped layer sharded over model=8 on the CPU mesh:
    kernels physically split 8-ways, forward finite, and equal to the
    unsharded layer."""
    from druglamp_tpu.encoders.esm2 import ESM2Config, ESMLayer
    from druglamp_tpu.encoders.sharding import shard_encoder_variables
    from druglamp_tpu.parallel.mesh import make_mesh

    cfg = ESM2Config(num_layers=1, embed_dim=5120, num_heads=40)
    layer = ESMLayer(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (1, 4, 5120), jnp.float32)
    pad = jnp.zeros((1, 4), bool)
    variables = layer.init(jax.random.key(0), x, pad)
    ref = layer.apply(variables, x, pad)

    mesh = make_mesh(n_model=8)
    sharded_vars = shard_encoder_variables(variables, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sharded_vars)[0]
    split = [leaf for path, leaf in flat
             if hasattr(leaf, "sharding") and "model" in str(leaf.sharding.spec)]
    assert split, "no kernel actually sharded over the model axis"
    for leaf in split:
        shard_shape = leaf.addressable_shards[0].data.shape
        assert np.prod(shard_shape) == np.prod(leaf.shape) // 8

    out = jax.jit(lambda v, x: layer.apply(v, x, pad))(sharded_vars, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_local_checkpoint_file_roundtrip(hf_esm, hf_roberta, tmp_path):
    """--esm-ckpt / --chemberta-ckpt wiring: a checkpoint saved to disk in
    any supported container (bare state_dict .pt, fair-esm 'model' dict,
    safetensors) converts to the same flax params as in-memory conversion
    (reference handler/dataset.py:54-63 loads the same artifacts)."""
    from druglamp_tpu.encoders.embed_pipeline import load_torch_state_dict

    ref = esm2_params_from_torch(hf_esm.state_dict(), num_layers=2)

    p1 = str(tmp_path / "esm_bare.pt")
    torch.save(hf_esm.state_dict(), p1)
    p2 = str(tmp_path / "esm_fairesm.pt")
    torch.save({"model": hf_esm.state_dict(), "cfg": {}}, p2)
    paths = [p1, p2]
    try:
        from safetensors.torch import save_file

        p3 = str(tmp_path / "esm.safetensors")
        save_file({k: v.contiguous() for k, v in hf_esm.state_dict().items()}, p3)
        paths.append(p3)
    except ImportError:
        pass

    for path in paths:
        got = esm2_params_from_torch(load_torch_state_dict(path), num_layers=2)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), ref, got)

    ref_cb = chemberta_params_from_torch(hf_roberta.state_dict(), num_layers=2)
    pc = str(tmp_path / "chemberta.pt")
    torch.save(hf_roberta.state_dict(), pc)
    got_cb = chemberta_params_from_torch(load_torch_state_dict(pc), num_layers=2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), ref_cb, got_cb)


def test_generate_embeddings_from_ckpt_file(hf_esm, tmp_path):
    """generate_embeddings(esm_ckpt=...) produces caches equal to a direct
    forward with the converted weights — one command from weights on disk
    to real caches."""
    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.dataset import EntityTable, featurize_drug, featurize_prot
    from druglamp_tpu.encoders import embed_pipeline
    import druglamp_tpu.encoders.esm2 as esm2_mod

    ckpt = str(tmp_path / "esm.pt")
    torch.save(hf_esm.state_dict(), ckpt)

    table = EntityTable()
    smi = "CCO"
    table.drug2ord[smi] = 0
    table.drugs[0] = featurize_drug(smi, 0, 64)
    seq = "MKTAYIAK"
    table.prot2ord[seq] = 0
    table.prots[0] = featurize_prot(seq, 0, 1022, 288)

    cache = EmbeddingCache(str(tmp_path / "cache"), "toy",
                           n_drug_feature=32, n_prot_feature=64)
    cfg_small = {12: esm2_mod.ESM2Config(num_layers=2, embed_dim=64,
                                         num_heads=4, ffn_dim=256)}
    orig_sizes, orig_buckets = esm2_mod._ESM2_SIZES, embed_pipeline._BUCKETS
    try:
        esm2_mod._ESM2_SIZES = {**orig_sizes, **cfg_small}
        embed_pipeline._BUCKETS = (16,)
        embed_pipeline.generate_embeddings(
            table, cache, n_layer=12, esm_ckpt=ckpt,
            chemberta_cfg=ChemBERTaConfig(vocab=64, hidden=32, num_layers=1,
                                          num_heads=4, intermediate=32,
                                          max_positions=64),
            batch=2, verbose=False)
    finally:
        esm2_mod._ESM2_SIZES = orig_sizes
        embed_pipeline._BUCKETS = orig_buckets

    params = esm2_params_from_torch(hf_esm.state_dict(), num_layers=2)
    model = ESM2(ESM2Config(num_layers=2, embed_dim=64, num_heads=4, ffn_dim=256))
    toks = esm_tokenize(seq, 1022)[None, :]
    pad = np.full((1, 16), ESM_PAD, np.int32)
    pad[0, :toks.shape[1]] = toks
    direct = np.asarray(model.apply({"params": params}, jnp.asarray(pad)))
    np.testing.assert_allclose(cache.prot(0), direct[0, :len(seq) + 2],
                               rtol=1e-5, atol=1e-6)


def test_batched_pads_batch_dim_to_fixed_shape():
    """Tail chunks must not produce ragged batch shapes (each unique
    (bucket, tail) pair would cold-compile a fresh encoder program)."""
    import numpy as np

    from druglamp_tpu.encoders.embed_pipeline import _batched

    items = [(i, np.arange(1, 5 + i, dtype=np.int32)) for i in range(11)]
    shapes, seen = set(), []
    for ords, toks, lens in _batched(items, batch=4, pad_id=0):
        assert toks.shape[0] == 4
        shapes.add(toks.shape)
        seen.extend(ords)
        assert len(ords) == len(lens) <= 4
        for r, (o, ln) in enumerate(zip(ords, lens)):
            assert ln == 4 + o
            assert (toks[r, :ln] == np.arange(1, 5 + o)).all()
    assert sorted(seen) == list(range(11))          # every item exactly once
    assert len(shapes) <= 2                         # one per length bucket


def test_embed_pipeline_pad_id_and_finiteness_guard():
    """Regression for the r4 all-NaN drug-cache incident: ChemBERTa derives
    RoBERTa position ids by counting non-pad tokens, so padding a bucket
    longer than max_positions with anything but the MODEL's pad id walks the
    position embedding out of range — flax Embed's take(mode='fill') fills
    NaN and poisons every row.  (a) the production pad (cfg.pad_id) stays
    finite at an oversized bucket; (b) a wrong pad id goes non-finite,
    exactly the state the pipeline's finiteness guard must refuse to cache.
    """
    import jax
    import jax.numpy as jnp

    from druglamp_tpu.encoders.chemberta import ChemBERTa, ChemBERTaConfig

    cfg = ChemBERTaConfig(vocab=64, hidden=32, num_layers=1, num_heads=4,
                          intermediate=32, max_positions=24)
    cb = ChemBERTa(cfg, dtype=jnp.float32)
    params = cb.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))["params"]
    ids = np.array([2, 17, 23, 5, 3], np.int32)   # CLS-ish + tokens
    L = 64  # bucket far beyond max_positions (the ESM-sized bucket case)

    toks_ok = np.full((2, L), cfg.pad_id, np.int32)
    toks_ok[:, : len(ids)] = ids
    out_ok = np.asarray(cb.apply({"params": params}, jnp.asarray(toks_ok)))
    assert np.isfinite(out_ok).all()

    wrong_pad = 0 if cfg.pad_id != 0 else 3
    toks_bad = np.full((2, L), wrong_pad, np.int32)
    toks_bad[:, : len(ids)] = ids
    out_bad = np.asarray(cb.apply({"params": params}, jnp.asarray(toks_bad)))
    assert not np.isfinite(out_bad).all()  # the failure mode the guard stops


def test_embed_pipeline_refuses_poisoned_cache(tmp_path, monkeypatch):
    """generate_embeddings must raise, not silently cache, when an encoder
    produces non-finite embeddings (r4 incident guard)."""
    import jax.numpy as jnp
    import pytest

    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.dataset import EntityTable, featurize_drug, featurize_prot
    from druglamp_tpu.encoders import embed_pipeline
    import druglamp_tpu.encoders.esm2 as esm2_mod

    table = EntityTable()
    table.drug2ord["CCO"] = 0
    table.drugs[0] = featurize_drug("CCO", 0, 64)
    table.prot2ord["MKTAYIAK"] = 0
    table.prots[0] = featurize_prot("MKTAYIAK", 0, 1022, 288)
    cache = EmbeddingCache(str(tmp_path), "toy", n_drug_feature=32,
                           n_prot_feature=64)

    from druglamp_tpu.encoders.chemberta import ChemBERTaConfig

    small = {12: esm2_mod.ESM2Config(num_layers=1, embed_dim=64, num_heads=4,
                                     ffn_dim=64)}
    orig = esm2_mod._ESM2_SIZES
    # poison the ESM forward: a jit-shaped apply that returns NaN
    real_jit = embed_pipeline.jax.jit
    monkeypatch.setattr(
        embed_pipeline.jax, "jit",
        lambda f: (lambda *a: real_jit(f)(*a) * jnp.nan))
    try:
        esm2_mod._ESM2_SIZES = {**orig, **small}
        with pytest.raises(RuntimeError, match="non-finite"):
            embed_pipeline.generate_embeddings(
                table, cache, n_layer=12,
                chemberta_cfg=ChemBERTaConfig(vocab=64, hidden=32,
                                              num_layers=1, num_heads=4,
                                              intermediate=32,
                                              max_positions=64),
                batch=1, verbose=False)
    finally:
        esm2_mod._ESM2_SIZES = orig
    assert not cache.has_prot(0) and not cache.has_drug(0)


def test_embed_pipeline_preloaded_params_hit_alignment_guard(tmp_path):
    """Advisor r4: PRE-LOADED real chemberta_params (no ckpt path) with the
    default regex tokenizer must hit the same silent-garbage guard as the
    --chemberta-ckpt branch — the regex tokenizer's self-assigned ids never
    index a real checkpoint's embedding rows."""
    import jax
    import jax.numpy as jnp
    import pytest

    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.dataset import EntityTable, featurize_drug, featurize_prot
    from druglamp_tpu.encoders import embed_pipeline
    from druglamp_tpu.encoders.chemberta import ChemBERTa, ChemBERTaConfig
    import druglamp_tpu.encoders.esm2 as esm2_mod

    table = EntityTable()
    table.drug2ord["CCO"] = 0
    table.drugs[0] = featurize_drug("CCO", 0, 64)
    table.prot2ord["MKTAYIAK"] = 0
    table.prots[0] = featurize_prot("MKTAYIAK", 0, 1022, 288)
    cache = EmbeddingCache(str(tmp_path), "toy", n_drug_feature=32,
                           n_prot_feature=64)
    cb_cfg = ChemBERTaConfig(vocab=64, hidden=32, num_layers=1, num_heads=4,
                             intermediate=32, max_positions=64)
    cb_params = ChemBERTa(cb_cfg).init(
        jax.random.key(0), jnp.ones((1, 4), jnp.int32))["params"]

    small = {12: esm2_mod.ESM2Config(num_layers=1, embed_dim=64, num_heads=4,
                                     ffn_dim=64)}
    orig = esm2_mod._ESM2_SIZES
    try:
        esm2_mod._ESM2_SIZES = {**orig, **small}
        with pytest.raises(ValueError, match="tokenizer"):
            embed_pipeline.generate_embeddings(
                table, cache, n_layer=12, chemberta_params=cb_params,
                chemberta_cfg=cb_cfg, batch=1, verbose=False)
    finally:
        esm2_mod._ESM2_SIZES = orig
    assert not cache.has_drug(0)
