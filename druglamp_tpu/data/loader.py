"""Batch assembly + background-prefetch loader.

Replaces torch DataLoader + ``multimodality_collate_func`` (reference
utils.py:326-334, main.py:138-153).  Fixed-shape numpy batches are assembled
on host (memset + scatter into preallocated buffers), prefetched on a
background thread, and handed to JAX; drug/protein frozen embeddings come
from an EmbeddingCache with tail-pad (drug, 512) / repeat-pad (protein,
2304) — utils.py:304-334 semantics.

Also builds the CM ground-truth arrays the jittable triplet loss consumes
(the dense form of reference cross_modality.py:137-149): per-batch
unique-entity slots (dict-of-last-occurrence semantics preserved), validity
masks, and a (B, B) label matrix with 0 = unobserved (counted negative) and
−1 = padded slot.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from druglamp_tpu.data.cache import ZeroEmbeddings
from druglamp_tpu.data.dataset import DTIDataset
from druglamp_tpu.data.encoding import pack_node_feats


def build_cm_arrays(prot_ids, drug_ids, labels) -> Dict[str, np.ndarray]:
    """Dense CM ground truth for one batch (slot order = first appearance,
    slot representative = LAST occurrence, as the reference dict builds)."""
    B = len(prot_ids)
    pid2t: Dict[int, int] = {}
    did2t: Dict[int, int] = {}
    for t in range(B):
        pid2t[int(prot_ids[t])] = t
        did2t[int(drug_ids[t])] = t
    p_slots = list(pid2t.keys())
    d_slots = list(did2t.keys())

    p_index = np.zeros(B, np.int32)
    p_valid = np.zeros(B, bool)
    d_index = np.zeros(B, np.int32)
    d_valid = np.zeros(B, bool)
    gt = np.full((B, B), -1.0, np.float32)
    for i, pid in enumerate(p_slots):
        p_index[i] = pid2t[pid]
        p_valid[i] = True
    for j, did in enumerate(d_slots):
        d_index[j] = did2t[did]
        d_valid[j] = True
    p_slot_of = {pid: i for i, pid in enumerate(p_slots)}
    d_slot_of = {did: j for j, did in enumerate(d_slots)}
    gt[: len(p_slots), : len(d_slots)] = 0.0
    for t in range(B):
        gt[p_slot_of[int(prot_ids[t])], d_slot_of[int(drug_ids[t])]] = labels[t]
    return {"p_index": p_index, "p_valid": p_valid, "d_index": d_index,
            "d_valid": d_valid, "gt": gt}


def _fast_zeros(shape, dtype) -> np.ndarray:
    """np.zeros that stays calloc-lazy for non-native dtypes (bfloat16)."""
    dt = np.dtype(dtype)
    n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
    return np.zeros(n, np.uint8).view(dt).reshape(shape)


def _batch_nbytes(batch) -> int:
    return sum(v.nbytes if hasattr(v, "nbytes") else _batch_nbytes(v)
               for v in batch.values())


def _tree_stack(batches):
    """Stack a list of (possibly nested) batch dicts along a new axis 0."""
    out = {}
    for k, v in batches[0].items():
        if isinstance(v, dict):
            out[k] = _tree_stack([b[k] for b in batches])
        else:
            out[k] = np.stack([b[k] for b in batches])
    return out


class BatchLoader:
    """Epoch iterator yielding fixed-shape numpy batch dicts."""

    def __init__(self, dataset: DTIDataset, batch_size: int, shuffle: bool,
                 drop_last: bool, embeddings=None, seed: int = 0,
                 prefetch: int = 2, include_llm: bool = True,
                 llm_dtype=None, compact: bool = False,
                 cache_max_bytes: int = 2 << 30, emb_ordinals: bool = False,
                 cm_groups: int = 1):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.emb = embeddings if embeddings is not None else ZeroEmbeddings()
        self.seed = seed
        self.prefetch = prefetch
        # include_llm=False (DrugLAMPwoLLM) drops the xd/xp arrays from the
        # batch entirely — they are ~98% of batch bytes and that model never
        # reads them.  LLM arrays ship as bfloat16 by default (half the
        # host→device traffic; the model computes in bf16 anyway).
        self.include_llm = include_llm
        # eval loaders (shuffle=False) re-assemble identical batches every
        # epoch; cache them after the first pass.  The cache is byte-capped:
        # LLM-bearing batches are ~1.7 MB/sample even in compact form, so an
        # uncapped cache would hold bindingdb-scale eval sets (tens of GB) in
        # RSS; past the cap the loader re-assembles each epoch instead (cheap:
        # ~7 ms/batch with the native packer, overlapped by prefetch).
        self.cache_batches = not shuffle
        self.cache_max_bytes = cache_max_bytes
        self._batch_cache: Optional[list] = None
        # compact=True ships the bit-packed/int8 batch form (decoded on
        # device inside the jitted step; see data/encoding.py) — ~6x fewer
        # host→device bytes
        self.compact = compact
        # emb_ordinals: ship int32 entity ordinals instead of the frozen LLM
        # embedding arrays; the jitted step gathers them from the
        # device-resident store (data/device_store.py).  Compact-form only.
        self.emb_ordinals = emb_ordinals
        if emb_ordinals:
            assert compact and include_llm, "emb_ordinals requires compact LLM batches"
        # cm_groups > 1: per-replica CM ground truth — one dense gt block per
        # contiguous batch slice (models/cm.py groups; torch-DDP emulation)
        self.cm_groups = cm_groups
        if llm_dtype is None:
            import ml_dtypes

            llm_dtype = ml_dtypes.bfloat16
        self.llm_dtype = llm_dtype

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self, epoch: int) -> np.ndarray:
        n = len(self.ds)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.RandomState(self.seed * 100003 + epoch)
        return rng.permutation(n)

    def _assemble(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        if self.compact:
            return self._assemble_compact(idx)
        return self._assemble_dense(idx)

    # group-64 packed layout (encoding.pack_adjacency): column c → byte
    # c mod (N/8), bit c div (N/8) — matching encoding.decode_batch and the
    # Pallas GCN kernel's lane-friendly unpack

    def _assemble_compact(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Build the compact batch DIRECTLY (no dense adjacency/masks):
        bit-packed adjacency scattered from edge lists, int8 features,
        scalar fill starts.  ~10× less host work than dense-then-compact
        (the dense path materializes (B,512,512) twice per batch); the
        output is bit-identical to encoding.compact_batch over the dense
        assembly (tests/test_data.py::test_compact_direct_matches_legacy)."""
        ds = self.ds
        n_real = len(idx)
        if n_real < self.batch_size:
            idx = np.concatenate([idx, np.full(self.batch_size - n_real, idx[0],
                                               dtype=idx.dtype)])
        B = len(idx)
        N = ds.max_nodes
        L = ds.seq_len
        nd = self.emb.n_drug_feature

        nb = N // 8
        eye = np.zeros((N, nb), np.uint8)
        cols = np.arange(N)
        eye[cols, cols % nb] = np.uint8(1) << (cols // nb).astype(np.uint8)

        batch = {
            "drug_node_feats": np.zeros((B, N, 75), np.int8),
            "drug_adj_packed": np.broadcast_to(eye, (B, N, N // 8)).copy(),
            "n_atoms": np.zeros((B,), np.int32),
            "vp": np.zeros((B, L), np.uint8),
            "p_fill_start": np.zeros((B,), np.int32),
            "d_ntok": np.zeros((B,), np.int32),
            "labels": np.zeros((B,), np.float32),
        }
        if self.emb_ordinals:
            batch["drug_ord"] = np.zeros((B,), np.int32)
            batch["prot_ord"] = np.zeros((B,), np.int32)
            del batch["d_ntok"]        # gathered on device from store lengths
        elif self.include_llm:
            # calloc-backed zeros: np.zeros with a non-native dtype (ml_dtypes
            # bfloat16) does an explicit ~27MB fill per batch; zero uint8 pages
            # viewed as bf16 are bit-identical (0x0000 == 0.0) and lazy
            batch["xd"] = _fast_zeros((B, N, nd), self.llm_dtype)
            src_len = ds.max_prot_resis + 2
            batch["xp_src"] = _fast_zeros(
                (B, src_len, self.emb.n_prot_feature), self.llm_dtype)
            batch["xp_len"] = np.zeros((B,), np.int32)

        for b, i in enumerate(idx):
            dord = int(ds.drug_ords[i])
            pord = int(ds.prot_ords[i])
            drec = ds.table.drugs[dord]
            prec = ds.table.prots[pord]
            n = drec.n_atoms
            batch["drug_node_feats"][b, :n, :74] = drec.node_feats
            batch["drug_node_feats"][b, n:, 74] = 1
            e0, e1 = drec.edges
            np.bitwise_or.at(batch["drug_adj_packed"][b],
                             (e0, e1 % nb),
                             np.uint8(1) << (e1 // nb).astype(np.uint8))
            batch["n_atoms"][b] = n
            batch["vp"][b] = prec.codes
            batch["p_fill_start"][b] = prec.fill_start
            batch["labels"][b] = ds.labels[i]

            if self.emb_ordinals:
                batch["drug_ord"][b] = dord
                batch["prot_ord"][b] = pord
                continue
            demb = self.emb.drug(dord)
            t = min(demb.shape[0], N)
            batch["d_ntok"][b] = t
            if self.include_llm:
                batch["xd"][b, :t] = demb[:t]
                pemb = self.emb.prot(pord)
                lp = min(pemb.shape[0], batch["xp_src"].shape[1])
                batch["xp_src"][b, :lp] = pemb[:lp]
                batch["xp_len"][b] = lp

        batch["valid"] = (np.arange(B) < n_real).astype(np.float32)
        batch["cm"] = self._cm_arrays(idx)
        # bit-pack the feature columns (12 B/atom instead of 75 — encoding.py)
        batch["drug_node_bits"], batch["drug_node_ints"] = pack_node_feats(
            batch["drug_node_feats"])
        del batch["drug_node_feats"]
        return batch

    def _cm_arrays(self, idx):
        ds = self.ds
        if self.cm_groups <= 1:
            return build_cm_arrays(ds.prot_ords[idx], ds.drug_ords[idx],
                                   ds.labels[idx])
        blocks = np.array_split(idx, self.cm_groups)
        per = [build_cm_arrays(ds.prot_ords[b], ds.drug_ords[b], ds.labels[b])
               for b in blocks]
        return {k: np.stack([p[k] for p in per]) for k in per[0]}

    def _assemble_dense(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        ds = self.ds
        n_real = len(idx)
        if n_real < self.batch_size:
            # pad ragged tail batches to the fixed batch shape (avoids jit
            # recompiles); "valid" masks the padding out of metrics/losses
            idx = np.concatenate([idx, np.full(self.batch_size - n_real, idx[0],
                                               dtype=idx.dtype)])
        B = len(idx)
        N = ds.max_nodes
        L = ds.seq_len
        nd = self.emb.n_drug_feature
        np_ = self.emb.n_prot_feature

        batch = {
            "drug_node_feats": np.zeros((B, N, 75), np.float32),
            "drug_adj": np.zeros((B, N, N), np.uint8),
            "drug_degrees": np.zeros((B, N), np.float32),
            "vp": np.zeros((B, L), np.int32),
            "p_fill": np.zeros((B, L), np.float32),
            "d_fill": np.zeros((B, N), np.float32),
            "labels": np.zeros((B,), np.float32),
        }
        if self.include_llm:
            batch["xd"] = np.zeros((B, N, nd), self.llm_dtype)
            if self.compact:
                # untiled embedding rows; tiling happens on device (decode)
                src_len = ds.max_prot_resis + 2
                batch["xp_src"] = np.zeros((B, src_len, np_), self.llm_dtype)
                batch["xp_len"] = np.zeros((B,), np.int32)
            else:
                batch["xp"] = np.zeros((B, L, np_), self.llm_dtype)
        from druglamp_tpu.chem import native as _native

        use_native = _native.available()
        if use_native:
            drecs = [ds.table.drugs[int(ds.drug_ords[i])] for i in idx]
            adj, deg = _native.assemble_batch([d.edges for d in drecs],
                                              np.array([d.n_atoms for d in drecs]),
                                              N)
            batch["drug_adj"] = adj
            batch["drug_degrees"] = deg

        ar = np.arange(N)
        for b, i in enumerate(idx):
            dord = int(ds.drug_ords[i])
            pord = int(ds.prot_ords[i])
            drec = ds.table.drugs[dord]
            prec = ds.table.prots[pord]
            n = drec.n_atoms
            batch["drug_node_feats"][b, :n, :74] = drec.node_feats
            batch["drug_node_feats"][b, n:, 74] = 1.0
            if not use_native:
                adj = batch["drug_adj"][b]
                adj[drec.edges[0], drec.edges[1]] = 1
                adj[ar, ar] = 1
                adj[ar[:n], ar[:n]] = 2
                batch["drug_degrees"][b] = adj.sum(1)
            batch["vp"][b] = prec.codes
            batch["p_fill"][b, prec.fill_start :] = 1.0
            batch["labels"][b] = ds.labels[i]

            demb = self.emb.drug(dord)          # (T, nd)
            t = min(demb.shape[0], N)
            batch["d_fill"][b, t:] = 1.0
            if self.include_llm:
                batch["xd"][b, :t] = demb[:t]
                pemb = self.emb.prot(pord)      # (Lp, np)
                lp = pemb.shape[0]
                if self.compact:
                    lp = min(lp, batch["xp_src"].shape[1])
                    batch["xp_src"][b, :lp] = pemb[:lp]
                    batch["xp_len"][b] = lp
                elif lp > 0:
                    quot = L // lp
                    for j in range(quot):
                        batch["xp"][b, j * lp : (j + 1) * lp] = pemb

        batch["valid"] = (np.arange(B) < n_real).astype(np.float32)
        batch["cm"] = self._cm_arrays(idx)
        if self.compact:
            from druglamp_tpu.data.encoding import compact_batch

            n_atoms = np.array([ds.table.drugs[int(ds.drug_ords[i])].n_atoms
                                for i in idx])
            batch = compact_batch(batch, n_atoms)
        return batch

    def first_batch(self, epoch: int = 0) -> Dict[str, np.ndarray]:
        """One batch, assembled synchronously — for model init / example
        shapes.  ``next(loader.epoch(0))`` abandons the prefetch generator,
        leaving its worker thread parked on a full queue holding batches;
        this path never starts a thread."""
        order = self._order(epoch)
        return self._assemble(order[: self.batch_size])

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        if self.cache_batches and self._batch_cache is not None:
            yield from self._batch_cache
            return
        collected = [] if self.cache_batches else None
        collected_bytes = 0
        for batch in self._epoch_uncached(epoch):
            if collected is not None:
                collected_bytes += _batch_nbytes(batch)
                if collected_bytes > self.cache_max_bytes:
                    collected = None   # over budget: keep streaming, no cache
                else:
                    collected.append(batch)
            yield batch
        if collected is not None:
            self._batch_cache = collected

    # Byte cap for one stacked chunk.  When the device-resident embedding
    # store is unavailable (over HBM budget) batches carry dense LLM
    # embeddings (~27-53 MB each): stacking scan_chunk=64 of them with
    # 2-deep prefetch would spike multiple GB of H2D/HBM exactly on the
    # large datasets where HBM is already tight (advisor r2) — so the chunk
    # shrinks to fit.  Ordinal/woLLM batches are ~100× smaller and never hit
    # the cap.
    STACKED_CHUNK_CAP_BYTES = 512 << 20

    def stacked_epoch(self, epoch: int,
                      chunk: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield the epoch's batches stacked along a new leading step axis,
        at most ``chunk`` steps per yield — the host-side feed for the
        epoch-in-scan driver (train/steps.make_epoch_step), which runs a
        whole chunk in ONE device dispatch.  The chunk is byte-capped (see
        STACKED_CHUNK_CAP_BYTES); the effective size is fixed from the first
        batch so every full chunk of an epoch has one shape (one scan
        compile; the trailing partial chunk is a second, amortized trace)."""
        pending = []
        eff_chunk = chunk

        def flush():
            stacked = _tree_stack(pending)
            pending.clear()
            return stacked

        for batch in self.epoch(epoch):
            if eff_chunk == chunk and not pending:
                per = _batch_nbytes(batch)
                if per * chunk > self.STACKED_CHUNK_CAP_BYTES:
                    eff_chunk = max(1, self.STACKED_CHUNK_CAP_BYTES // per)
            pending.append(batch)
            if len(pending) >= eff_chunk:
                yield flush()
        if pending:
            yield flush()

    def _epoch_uncached(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order(epoch)
        n = len(order)
        bs = self.batch_size
        stops = range(0, n - bs + 1, bs) if self.drop_last else range(0, n, bs)
        chunks = [order[s : s + bs] for s in stops]

        if self.prefetch <= 0:
            for c in chunks:
                yield self._assemble(c)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for c in chunks:
                    q.put(self._assemble(c))
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            yield item
        t.join()
