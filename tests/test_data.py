"""Data pipeline tests: entity tables, batch assembly, CM arrays, loader."""

import os

import numpy as np
import pytest

from druglamp_tpu.data.cache import EmbeddingCache, ZeroEmbeddings
from druglamp_tpu.data.dataset import DTIDataset, build_entity_table
from druglamp_tpu.data.loader import BatchLoader, build_cm_arrays

DATA_ROOT = "/root/reference/datasets"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA_ROOT),
                                reason="reference datasets not mounted")


@pytest.fixture(scope="module")
def human_val():
    return DTIDataset(DATA_ROOT, "human", "random", "val.csv",
                      max_nodes=512, seq_len=2304, cutoff=64)


def test_dataset_basics(human_val):
    ds = human_val
    assert len(ds) == 64
    assert ds.table.n_drug > 0 and ds.table.n_prot > 0
    rec = ds.table.drugs[int(ds.drug_ords[0])]
    assert rec.node_feats.shape[1] == 74
    assert rec.n_atoms <= 512
    prec = ds.table.prots[int(ds.prot_ords[0])]
    assert prec.codes.shape == (2304,)
    assert 0 < prec.fill_start <= 2304


def test_batch_assembly(human_val):
    loader = BatchLoader(human_val, batch_size=8, shuffle=False, drop_last=True,
                         prefetch=0)
    batch = next(loader.epoch(0))
    assert batch["drug_node_feats"].shape == (8, 512, 75)
    assert batch["drug_adj"].shape == (8, 512, 512)
    assert batch["vp"].shape == (8, 2304)
    assert batch["valid"].sum() == 8
    # adjacency: diag is 2 on real atoms / 1 on virtual; symmetric
    for b in range(8):
        rec = human_val.table.drugs[int(human_val.drug_ords[b])]
        d = np.diag(batch["drug_adj"][b])
        assert np.all(d[: rec.n_atoms] == 2)
        assert np.all(d[rec.n_atoms :] == 1)
        assert np.array_equal(batch["drug_adj"][b], batch["drug_adj"][b].T)
        assert np.array_equal(batch["drug_degrees"][b], batch["drug_adj"][b].sum(1))
    # zero embeddings → d_fill all ones, xp zeros
    assert np.all(batch["d_fill"] == 1.0)
    assert np.all(batch["xp"] == 0.0)


def test_ragged_tail_padding(human_val):
    loader = BatchLoader(human_val, batch_size=48, shuffle=False, drop_last=False,
                         prefetch=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[1]["valid"].sum() == 64 - 48
    assert batches[1]["drug_node_feats"].shape[0] == 48


def test_shuffle_deterministic(human_val):
    l1 = BatchLoader(human_val, 8, shuffle=True, drop_last=True, seed=5, prefetch=0)
    l2 = BatchLoader(human_val, 8, shuffle=True, drop_last=True, seed=5, prefetch=0)
    b1 = next(l1.epoch(3))
    b2 = next(l2.epoch(3))
    assert np.array_equal(b1["labels"], b2["labels"])
    b3 = next(l1.epoch(4))
    assert not np.array_equal(b1["vp"], b3["vp"])


def test_prefetch_matches_sync(human_val):
    ls = BatchLoader(human_val, 8, shuffle=False, drop_last=True, prefetch=0)
    lp = BatchLoader(human_val, 8, shuffle=False, drop_last=True, prefetch=2)
    for bs, bp in zip(ls.epoch(0), lp.epoch(0)):
        assert np.array_equal(bs["vp"], bp["vp"])
        assert np.array_equal(bs["drug_adj"], bp["drug_adj"])


def test_cm_arrays_semantics():
    prot_ids = np.array([7, 7, 9, 9])
    drug_ids = np.array([1, 2, 1, 3])
    labels = np.array([1.0, 0.0, 0.0, 1.0])
    cm = build_cm_arrays(prot_ids, drug_ids, labels)
    # unique prots: 7 (slot 0, last occurrence t=1), 9 (slot 1, t=3)
    assert cm["p_valid"].tolist() == [True, True, False, False]
    assert cm["p_index"][0] == 1 and cm["p_index"][1] == 3
    # unique drugs: 1 (t=2), 2 (t=1), 3 (t=3)
    assert cm["d_valid"].tolist() == [True, True, True, False]
    assert cm["d_index"][:3].tolist() == [2, 1, 3]
    # gt: observed pairs take Y, unobserved valid pairs are 0, padding is -1
    assert cm["gt"][0, 0] == 1.0 and cm["gt"][0, 1] == 0.0
    assert cm["gt"][1, 0] == 0.0 and cm["gt"][1, 2] == 1.0
    assert cm["gt"][0, 2] == 0.0  # unobserved (7,3) counted negative
    assert np.all(cm["gt"][3, :] == -1.0)
    assert np.all(cm["gt"][:, 3] == -1.0)


def test_embedding_cache_roundtrip(tmp_path):
    cache = EmbeddingCache(str(tmp_path), "human", 384, 640)
    emb = np.random.rand(17, 384).astype(np.float32)
    cache.put_drug(3, emb)
    assert cache.has_drug(3)
    assert np.allclose(cache.drug(3), emb)
    pe = np.random.rand(100, 640).astype(np.float32)
    cache.put_prot(5, pe)
    assert np.allclose(cache.prot(5), pe)
    assert not cache.has_drug(4)


def test_cluster_split_rs_task_wiring(tmp_path):
    """cluster/Tcpi splits train on source_train.csv, eval on target_test.csv."""
    import csv as _csv

    d = tmp_path / "toy" / "cluster"
    os.makedirs(d, exist_ok=True)
    rows = [
        {"SMILES": "CCO", "Protein": "MKTA", "Y": 1, "drug_cluster": 0,
         "target_cluster": 1},
        {"SMILES": "CCN", "Protein": "MSEQ", "Y": 0, "drug_cluster": 1,
         "target_cluster": 0},
    ]
    for name in ("source_train.csv", "target_test.csv"):
        with open(d / name, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            for r in rows:
                w.writerow(r)
    train = DTIDataset(str(tmp_path), "toy", "cluster", "source_train.csv",
                       max_nodes=32, seq_len=288)
    test = DTIDataset(str(tmp_path), "toy", "cluster", "target_test.csv",
                      table=train.table, max_nodes=32, seq_len=288)
    assert len(train) == 2 and len(test) == 2
    # extra cluster columns are carried but ignored by featurization
    loader = BatchLoader(train, 2, shuffle=False, drop_last=False, prefetch=0)
    b = next(loader.epoch(0))
    assert b["labels"].tolist() == [1.0, 0.0]


def test_compact_encoding_roundtrip(human_val):
    """decode(compact batch) reproduces the standard batch exactly."""
    import jax
    import jax.numpy as jnp

    from druglamp_tpu.data.encoding import decode_batch

    std = next(BatchLoader(human_val, 8, shuffle=False, drop_last=True,
                           prefetch=0, compact=False, include_llm=False).epoch(0))
    cmp_ = next(BatchLoader(human_val, 8, shuffle=False, drop_last=True,
                            prefetch=0, compact=True, include_llm=False).epoch(0))
    # compact batch is much smaller on the wire
    std_bytes = sum(v.nbytes for v in std.values() if hasattr(v, "nbytes"))
    cmp_bytes = sum(v.nbytes for v in cmp_.values() if hasattr(v, "nbytes"))
    assert cmp_bytes < std_bytes / 3

    dec = jax.jit(decode_batch)(jax.tree.map(jnp.asarray, cmp_))
    for key in ("drug_adj", "drug_degrees", "drug_node_feats", "vp",
                "p_fill", "d_fill", "labels"):
        np.testing.assert_array_equal(np.asarray(dec[key]), std[key],
                                      err_msg=key)


def test_fused_transfer_roundtrip(human_val):
    """fuse → device → unfuse reproduces the compact batch exactly, and the
    fused+decoded batch matches the standard batch through decode_batch."""
    import jax
    import jax.numpy as jnp

    from druglamp_tpu.data.encoding import BatchFuser, decode_batch
    from druglamp_tpu.parallel.mesh import MeshContext, make_mesh

    cmp_ = next(BatchLoader(human_val, 8, shuffle=False, drop_last=True,
                            prefetch=0, compact=True, include_llm=False).epoch(0))
    fuser = BatchFuser(cmp_)
    buf = fuser.fuse(cmp_)
    assert buf.dtype == np.uint8 and buf.shape[0] == 8
    rec = jax.jit(fuser.unfuse)(jnp.asarray(buf))
    flat_in = {k: v for k, v in cmp_.items() if not isinstance(v, dict)}
    for k, v in flat_in.items():
        np.testing.assert_array_equal(np.asarray(rec[k]), v, err_msg=k)
    for k, v in cmp_["cm"].items():
        np.testing.assert_array_equal(np.asarray(rec["cm"][k]), v, err_msg=k)

    # through the mesh helper (8-way data sharding)
    ctx = MeshContext(make_mesh(1))
    dev = ctx.fused_shard_batch(cmp_)
    std = next(BatchLoader(human_val, 8, shuffle=False, drop_last=True,
                           prefetch=0, compact=False, include_llm=False).epoch(0))
    dec = jax.jit(decode_batch)(dev)
    np.testing.assert_array_equal(np.asarray(dec["drug_adj"]), std["drug_adj"])
    np.testing.assert_array_equal(np.asarray(dec["vp"]), std["vp"])
    np.testing.assert_array_equal(np.asarray(dec["p_fill"]), std["p_fill"])


def test_device_side_xp_tiling(tmp_path):
    """Compact xp_src + device tiling == host repeat_pad tiling exactly."""
    import jax
    import jax.numpy as jnp

    from druglamp_tpu.data.cache import EmbeddingCache
    from druglamp_tpu.data.encoding import decode_batch

    ds = DTIDataset(DATA_ROOT, "human", "random", "val.csv",
                    max_nodes=512, seq_len=2304, cutoff=8)
    cache = EmbeddingCache(str(tmp_path), "human", 16, 24)
    r = np.random.RandomState(0)
    for o in range(ds.table.n_drug):
        cache.put_drug(o, r.rand(5, 16).astype(np.float32))
    for o in range(ds.table.n_prot):
        L = int(np.random.RandomState(o).randint(50, 1024))
        cache.put_prot(o, r.rand(L, 24).astype(np.float32))

    std = next(BatchLoader(ds, 8, shuffle=False, drop_last=True, prefetch=0,
                           embeddings=cache, compact=False,
                           llm_dtype=np.float32).epoch(0))
    cmp_ = next(BatchLoader(ds, 8, shuffle=False, drop_last=True, prefetch=0,
                            embeddings=cache, compact=True,
                            llm_dtype=np.float32).epoch(0))
    assert "xp_src" in cmp_ and "xp" not in cmp_
    dec = jax.jit(decode_batch)(jax.tree.map(jnp.asarray, cmp_))
    np.testing.assert_allclose(np.asarray(dec["xp"]), std["xp"], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(dec["xd"]), std["xd"])


def test_eval_batch_cache(human_val):
    loader = BatchLoader(human_val, 16, shuffle=False, drop_last=False, prefetch=0)
    a = list(loader.epoch(0))
    assert loader._batch_cache is not None
    b = list(loader.epoch(5))   # cached: epoch index ignored for eval loaders
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x is y
    # shuffled loaders never cache
    tr = BatchLoader(human_val, 16, shuffle=True, drop_last=True, prefetch=0)
    list(tr.epoch(0))
    assert tr._batch_cache is None


def test_eval_cache_byte_cap(tmp_path):
    """Eval loaders cache batches only up to cache_max_bytes; past the cap
    they stream (re-assemble) every epoch with identical contents."""
    from tests.test_train import _make_csv_dataset
    from tests.util import tiny_config

    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config()
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    ds = DTIDataset(root, "toy", "random", "train.csv", **kw)
    emb = ZeroEmbeddings(24, 40)

    cached = BatchLoader(ds, 4, shuffle=False, drop_last=False, embeddings=emb,
                         prefetch=0, include_llm=False)
    capped = BatchLoader(ds, 4, shuffle=False, drop_last=False, embeddings=emb,
                         prefetch=0, include_llm=False, cache_max_bytes=1)

    b_cached = list(cached.epoch(0))
    b_capped = list(capped.epoch(0))
    assert cached._batch_cache is not None
    assert capped._batch_cache is None          # over budget: never cached
    b_capped2 = list(capped.epoch(1))           # second pass re-assembles
    for a, b, c in zip(b_cached, b_capped, b_capped2):
        for k in a:
            if k == "cm":
                continue
            np.testing.assert_array_equal(a[k], b[k])
            np.testing.assert_array_equal(a[k], c[k])


def test_compact_direct_matches_legacy(tmp_path):
    """The direct-compact assembler (_assemble_compact) is bit-identical to
    compact_batch over the dense assembly, for both LLM and woLLM batches."""
    from druglamp_tpu.data.encoding import compact_batch
    from tests.test_train import _make_csv_dataset
    from tests.util import tiny_config

    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config()
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    ds = DTIDataset(root, "toy", "random", "train.csv", **kw)

    class RandEmb:
        n_drug_feature, n_prot_feature = 24, 40
        def drug(self, o):
            return np.random.RandomState(o).randn(5 + o % 7, 24).astype(np.float32)
        def prot(self, o):
            return np.random.RandomState(100 + o).randn(9 + o % 5, 40).astype(np.float32)

    for llm in (False, True):
        ld = BatchLoader(ds, 5, shuffle=True, drop_last=False, embeddings=RandEmb(),
                         prefetch=0, include_llm=llm, compact=True)
        idx = ld._order(3)[:5]
        direct = ld._assemble_compact(idx)
        dense = ld._assemble_dense(idx)
        # legacy tail: _assemble_dense already applies compact_batch
        assert "drug_adj_packed" in dense
        assert sorted(_flat(direct)) == sorted(_flat(dense))
        for k, a in _flat(direct).items():
            b = _flat(dense)[k]
            assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
            np.testing.assert_array_equal(a, b, err_msg=k)


def _flat(d, p=""):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flat(v, p + k + "."))
        else:
            out[p + k] = v
    return out


def test_device_store_decode_matches_host_shipping(tmp_path):
    """Batches carrying entity ordinals + the device-resident store decode to
    the same tensors as host-shipped embeddings (data/device_store.py)."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from druglamp_tpu.data.device_store import DeviceEmbeddingStore
    from druglamp_tpu.data.encoding import decode_batch
    from tests.test_train import _make_csv_dataset
    from tests.util import tiny_config

    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config()
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    ds = DTIDataset(root, "toy", "random", "train.csv", **kw)

    class Emb:
        n_drug_feature, n_prot_feature = 24, 40
        def drug(self, o):
            return (np.random.RandomState(o).randn(5 + o % 7, 24)
                    .astype(ml_dtypes.bfloat16))
        def prot(self, o):
            return (np.random.RandomState(100 + o).randn(9 + o % 5, 40)
                    .astype(ml_dtypes.bfloat16))

    store = DeviceEmbeddingStore.build(
        ds.table, Emb(), max_drug_tokens=cfg.drug.max_nodes,
        max_prot_len=cfg.protein.max_resis + 2)
    assert store is not None

    mk = lambda ords: BatchLoader(ds, 5, shuffle=True, drop_last=False,
                                  embeddings=Emb(), prefetch=0,
                                  include_llm=True, compact=True,
                                  emb_ordinals=ords)
    idx = mk(False)._order(7)[:5]
    host = decode_batch(jax.tree.map(jnp.asarray, mk(False)._assemble(idx)))
    ords = decode_batch(jax.tree.map(jnp.asarray, mk(True)._assemble(idx)),
                        store=store.tree)
    assert sorted(host) == sorted(ords)
    for k in host:
        if k == "cm":
            continue
        np.testing.assert_array_equal(np.asarray(host[k]), np.asarray(ords[k]),
                                      err_msg=k)

    # over-budget → None (fallback contract)
    assert DeviceEmbeddingStore.build(ds.table, Emb(), 512, 1024,
                                      budget_bytes=10) is None


def test_loader_cm_groups(tmp_path):
    """cm_groups>1 stacks one per-block dense gt per contiguous batch slice,
    each block equal to build_cm_arrays over that slice."""
    from tests.test_train import _make_csv_dataset
    from tests.util import tiny_config

    root = _make_csv_dataset(tmp_path)
    cfg = tiny_config()
    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    ds = DTIDataset(root, "toy", "random", "train.csv", **kw)
    ld = BatchLoader(ds, 8, shuffle=True, drop_last=True,
                     embeddings=ZeroEmbeddings(24, 40), prefetch=0,
                     include_llm=False, compact=True, cm_groups=2)
    idx = ld._order(1)[:8]
    cm = ld._assemble(idx)["cm"]
    assert cm["gt"].shape == (2, 4, 4)
    for g, sl in enumerate((slice(0, 4), slice(4, 8))):
        ref = build_cm_arrays(ds.prot_ords[idx[sl]], ds.drug_ords[idx[sl]],
                              ds.labels[idx[sl]])
        for k in ref:
            np.testing.assert_array_equal(cm[k][g], ref[k], err_msg=k)


def test_stacked_epoch_byte_cap(monkeypatch):
    """Dense-LLM batches shrink the stacked chunk to fit the byte cap
    (advisor r2: scan_chunk=64 of ~27MB host-shipped embedding batches
    spikes multi-GB H2D); small batches are unaffected."""
    import numpy as np

    from druglamp_tpu.data import loader as loader_mod

    class FakeLoader(loader_mod.BatchLoader):
        def __init__(self, per_batch_kb, n_batches):
            self._n = n_batches
            self._arr = np.zeros(per_batch_kb * 256, np.float32)  # kb*1024 bytes

        def epoch(self, epoch=0):
            for _ in range(self._n):
                yield {"x": self._arr}

    fl = FakeLoader(per_batch_kb=64, n_batches=8)
    monkeypatch.setattr(FakeLoader, "STACKED_CHUNK_CAP_BYTES", 128 * 1024)
    # 64 KB per batch, 128 KB cap → 2 batches per chunk even though chunk=8
    chunks = list(fl.stacked_epoch(0, 8))
    assert [c["x"].shape[0] for c in chunks] == [2, 2, 2, 2]

    monkeypatch.setattr(FakeLoader, "STACKED_CHUNK_CAP_BYTES", 1 << 30)
    chunks = list(fl.stacked_epoch(0, 8))
    assert [c["x"].shape[0] for c in chunks] == [8]


def test_node_feature_bit_packing_roundtrip():
    """pack_node_feats → unpack (host np + device jnp) reproduces the 75-dim
    feature matrix exactly, including negative formal charges and radical
    counts (the two non-binary columns, encoding.FEAT_INT_COLS)."""
    import jax
    import jax.numpy as jnp

    from druglamp_tpu.data.encoding import (FEAT_INT_COLS, _unpack_node_feats_jnp,
                                            pack_node_feats, unpack_node_feats_np)

    r = np.random.RandomState(0)
    feats = (r.rand(4, 16, 75) < 0.2).astype(np.float32)
    feats[..., FEAT_INT_COLS[0]] = r.randint(-2, 3, size=(4, 16))   # charge
    feats[..., FEAT_INT_COLS[1]] = r.randint(0, 3, size=(4, 16))    # radicals
    bits, ints = pack_node_feats(feats)
    assert bits.dtype == np.uint8 and bits.shape == (4, 16, 10)
    assert ints.dtype == np.int8 and ints.shape == (4, 16, 2)
    np.testing.assert_array_equal(unpack_node_feats_np(bits, ints), feats)
    dec = jax.jit(_unpack_node_feats_jnp)(jnp.asarray(bits), jnp.asarray(ints))
    np.testing.assert_array_equal(np.asarray(dec), feats)
