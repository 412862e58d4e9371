"""Device-resident frozen-embedding store.

The frozen ChemBERTa/ESM-2 embeddings are per-ENTITY constants, but the host
pipeline re-ships them per SAMPLE (~27 MB/batch, ~7 GB/epoch over the
device link — the dominant transfer for the LLM models).  TPU-idiomatic fix:
upload every unique entity's embedding to HBM once, ship only int32 ordinals
in the batch, and gather on device inside the jitted step.

Sizes (human/random, ESM-t30): ~2.5k proteins × 1024 × 640 bf16 ≈ 3.3 GB +
~4.7k drugs × 512 × 384 bf16 ≈ 1.8 GB — comfortably resident on a 16 GB
chip next to params/optimizer state.  ``budget_bytes`` guards larger
datasets: over budget the store reports None and callers fall back to
host-shipped embeddings (replaces nothing silently).

Replaces the reference's per-sample ``torch.load`` + collate shipping
(handler/dataset.py:189-195, utils.py:304-334) with a once-per-run upload.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class DeviceEmbeddingStore:
    """Entity-ordinal-indexed embedding arrays resident on device.

    Exposed as a pytree-of-arrays via ``.tree`` so jitted steps take it as a
    regular argument (no recompile across calls, no re-upload: the arrays
    live on device and are passed by reference).
    """

    def __init__(self, drug_emb, drug_len, prot_emb, prot_len):
        self.tree = {"drug_emb": drug_emb, "drug_len": drug_len,
                     "prot_emb": prot_emb, "prot_len": prot_len}

    @staticmethod
    def estimate_bytes(table, cache, max_drug_tokens: int,
                       max_prot_len: int) -> int:
        nd, npf = cache.n_drug_feature, cache.n_prot_feature
        return 2 * (table.n_drug * max_drug_tokens * nd
                    + table.n_prot * max_prot_len * npf)

    @classmethod
    def build(cls, table, cache, max_drug_tokens: int = 512,
              max_prot_len: int = 1024,
              budget_bytes: int = 8 << 30,
              sharding=None) -> Optional["DeviceEmbeddingStore"]:
        """Assemble + upload; None when the store would exceed budget_bytes.

        ``sharding``: optional NamedSharding (normally replicated P()) for
        multi-device meshes.
        """
        import jax
        import jax.numpy as jnp
        import ml_dtypes

        if cls.estimate_bytes(table, cache, max_drug_tokens,
                              max_prot_len) > budget_bytes:
            return None

        bf16 = ml_dtypes.bfloat16
        nd, npf = cache.n_drug_feature, cache.n_prot_feature

        def zeros(shape):
            n = int(np.prod(shape, dtype=np.int64)) * 2
            return np.zeros(n, np.uint8).view(bf16).reshape(shape)

        drug_emb = zeros((table.n_drug, max_drug_tokens, nd))
        drug_len = np.zeros((table.n_drug,), np.int32)
        for o in range(table.n_drug):
            e = cache.drug(o)
            t = min(e.shape[0], max_drug_tokens)
            drug_emb[o, :t] = e[:t]
            drug_len[o] = t

        prot_emb = zeros((table.n_prot, max_prot_len, npf))
        prot_len = np.zeros((table.n_prot,), np.int32)
        for o in range(table.n_prot):
            e = cache.prot(o)
            t = min(e.shape[0], max_prot_len)
            prot_emb[o, :t] = e[:t]
            prot_len[o] = t

        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jnp.asarray
        return cls(put(drug_emb), put(drug_len), put(prot_emb), put(prot_len))
