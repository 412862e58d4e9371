"""Frozen-encoder embedding cache.

The reference stores one torch ``.pt`` per entity
({ds}_{ord}_{prot|drug}_..._embedded.pt, handler/dataset.py:119-171) and
torch.loads them per *sample* in the hot input path.  Here the cache is
numpy: one ``.npy`` per entity written once by the embedding pipeline
(encoders/embed_pipeline.py), loaded once into RAM at startup (caches are
small: entities × seq × dim ≪ host memory), then sliced per batch with no
per-sample disk I/O.

``ZeroEmbeddings`` serves zeros (shape-correct) for the woLLM path and for
runs before the encoder caches exist.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


class ZeroEmbeddings:
    """Shape-correct zero embeddings (drug (0,·) / prot (0,·) → all-pad)."""

    def __init__(self, n_drug_feature: int = 384, n_prot_feature: int = 640):
        self.n_drug_feature = n_drug_feature
        self.n_prot_feature = n_prot_feature

    def drug(self, ordinal: int) -> np.ndarray:
        return np.zeros((0, self.n_drug_feature), np.float32)

    def prot(self, ordinal: int) -> np.ndarray:
        return np.zeros((0, self.n_prot_feature), np.float32)


class TableZeroEmbeddings(ZeroEmbeddings):
    """Zero-VALUED embeddings at the REAL per-entity token lengths.

    For perf measurement without an on-disk cache (the ``zero-store`` bench
    tier): throughput through the device store depends only on shapes and
    gathers, not values, but all-zero LENGTHS (plain ZeroEmbeddings) make
    every sequence fully masked — degenerate attention that can NaN-poison
    the step.  Lengths here reproduce what the real embed pipeline writes
    (encoders/embed_pipeline.py): drugs = SmilesTokenizer.encode length
    (CLS + tokens + SEP, truncated), proteins = min(len, max_resis) + 2
    (ESM BOS/EOS rows, reference handler/dataset.py:138-147)."""

    def __init__(self, drug_lens: Dict[int, int], prot_lens: Dict[int, int],
                 n_drug_feature: int = 384, n_prot_feature: int = 640):
        super().__init__(n_drug_feature, n_prot_feature)
        self._drug_lens = drug_lens
        self._prot_lens = prot_lens

    @classmethod
    def from_table(cls, table, n_drug_feature: int = 384,
                   n_prot_feature: int = 640, max_prot_resis: int = 1022,
                   max_drug_tokens: int = 512) -> "TableZeroEmbeddings":
        drug_lens: Dict[int, int] = {}
        d2o = getattr(table, "drug2ord", None)
        if d2o:
            from druglamp_tpu.chem.tokenizer import SmilesTokenizer

            tok = SmilesTokenizer()
            drug_lens = {o: len(tok.encode(smi, max_length=max_drug_tokens))
                         for smi, o in d2o.items()}
        p2o = getattr(table, "prot2ord", None)
        prot_lens = {o: min(len(seq), max_prot_resis) + 2
                     for seq, o in p2o.items()} if p2o else {}
        return cls(drug_lens, prot_lens, n_drug_feature, n_prot_feature)

    def drug(self, ordinal: int) -> np.ndarray:
        n = self._drug_lens.get(ordinal, 0)
        return np.zeros((n, self.n_drug_feature), np.float32)

    def prot(self, ordinal: int) -> np.ndarray:
        n = self._prot_lens.get(ordinal, 0)
        return np.zeros((n, self.n_prot_feature), np.float32)


class EmbeddingCache:
    """Directory of per-entity .npy arrays, preloaded into RAM."""

    def __init__(self, cache_dir: str, dataset: str,
                 n_drug_feature: int = 384, n_prot_feature: int = 640,
                 preload: bool = True, dtype=None):
        self.cache_dir = cache_dir
        self.dataset = dataset
        self.n_drug_feature = n_drug_feature
        self.n_prot_feature = n_prot_feature
        self._drug: Dict[int, np.ndarray] = {}
        self._prot: Dict[int, np.ndarray] = {}
        self._preload = preload
        # convert once at load (e.g. bfloat16): batch assembly then copies
        # with no per-batch ml_dtypes casting in the hot path
        self._dtype = np.dtype(dtype) if dtype is not None else None

    def drug_path(self, ordinal: int) -> str:
        return os.path.join(self.cache_dir, f"{self.dataset}_{ordinal}_drug_embedded.npy")

    def prot_path(self, ordinal: int) -> str:
        return os.path.join(self.cache_dir,
                            f"{self.dataset}_{ordinal}_prot_{self.n_prot_feature}_embedded.npy")

    def has_drug(self, ordinal: int) -> bool:
        return ordinal in self._drug or os.path.exists(self.drug_path(ordinal))

    def has_prot(self, ordinal: int) -> bool:
        return ordinal in self._prot or os.path.exists(self.prot_path(ordinal))

    def put_drug(self, ordinal: int, emb: np.ndarray) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        np.save(self.drug_path(ordinal), emb.astype(np.float32))

    def put_prot(self, ordinal: int, emb: np.ndarray) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        np.save(self.prot_path(ordinal), emb.astype(np.float32))

    def _convert(self, arr: np.ndarray) -> np.ndarray:
        return arr.astype(self._dtype) if self._dtype is not None else arr

    def drug(self, ordinal: int) -> np.ndarray:
        if ordinal not in self._drug:
            arr = self._convert(np.load(self.drug_path(ordinal)))
            if not self._preload:
                return arr
            self._drug[ordinal] = arr
        return self._drug[ordinal]

    def prot(self, ordinal: int) -> np.ndarray:
        if ordinal not in self._prot:
            arr = self._convert(np.load(self.prot_path(ordinal)))
            if not self._preload:
                return arr
            self._prot[ordinal] = arr
        return self._prot[ordinal]
