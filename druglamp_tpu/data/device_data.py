"""Device-resident training data: upload the dataset once, gather per step.

The epoch pipeline's residual costs after the epoch-in-scan work are all
HOST costs: per-epoch batch assembly (bit-packing, CM ground truth, stacking)
and the H2D transfer of every stacked chunk — on this box's single CPU core
they bound real epochs to ~1/4 of the pure device step rate.  TPU-idiomatic
fix, mirroring the frozen-embedding store (data/device_store.py): the batch
content is a pure function of (drug ordinal, protein ordinal, label), so

  - per-ENTITY compact arrays (packed node features, packed adjacency,
    protein codes) are uploaded to HBM once per run (~40 KB/drug, ~2.3 KB/
    protein — tens of MB per dataset);
  - per-PAIR arrays (drug_ord, prot_ord, label) are uploaded once;
  - each epoch ships ONE (n_steps, B) int32 index array (~KBs) — the same
    permutation BatchLoader uses, so batch composition is bit-identical to
    the host pipeline (tests/test_device_data.py);
  - the jitted epoch scan gathers each batch from HBM and builds the CM
    ground-truth arrays on device (`cm_arrays_device`, an exact jittable
    re-expression of loader.build_cm_arrays' dict semantics).

Replaces per-epoch host work with device gathers that overlap the MXU work;
the host's per-epoch duty shrinks to a permutation + a few dispatches.

Reference equivalence: this feeds the same per-step batches as the torch
DataLoader + collate path (reference main.py:138-153, utils.py:304-334);
only the transport changes.  Gated by --device-data (cli/main.py) /
DRUGLAMP_DEVICE_DATA=1; default remains the host pipeline.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from druglamp_tpu.data.encoding import pack_node_feats


def cm_arrays_device(pid, did, labels):
    """Jittable CM ground truth for one batch — exact device re-expression of
    loader.build_cm_arrays (slot order = first appearance, representative =
    last occurrence, later rows overwrite gt cells)."""
    import jax.numpy as jnp

    B = pid.shape[0]
    t = jnp.arange(B, dtype=jnp.int32)

    def slots(ids):
        same = ids[:, None] == ids[None, :]            # (B,B) same[t, j]
        first = jnp.argmax(same & (t[None, :] <= t[:, None]), axis=1)
        is_first = first == t
        slot_at_first = jnp.cumsum(is_first.astype(jnp.int32)) - 1
        slot_of_t = slot_at_first[first]               # slot index per row
        n = is_first.sum()
        rep = jnp.zeros(B, jnp.int32).at[slot_of_t].max(t)  # last occurrence
        return slot_of_t, n, rep

    sp, n_p, p_index = slots(pid)
    sd, n_d, d_index = slots(did)
    p_valid = t < n_p
    d_valid = t < n_d

    gt = jnp.where((t[:, None] < n_p) & (t[None, :] < n_d),
                   jnp.float32(0.0), jnp.float32(-1.0))
    # last-wins scatter: drop every (sp, sd) cell hit again by a later row
    dup_later = ((sp[None, :] == sp[:, None]) & (sd[None, :] == sd[:, None])
                 & (t[None, :] > t[:, None]))
    keep = ~dup_later.any(axis=1)
    rows = jnp.where(keep, sp, B)                      # B → out of range, dropped
    gt = gt.at[rows, sd].set(labels.astype(jnp.float32), mode="drop")
    return {"p_index": p_index, "p_valid": p_valid,
            "d_index": d_index, "d_valid": d_valid, "gt": gt}


class DeviceDataStore:
    """Entity-level compact arrays (shared across splits of one EntityTable)
    plus per-dataset pair arrays, all resident on device.

    ``tree_for(dataset)`` returns a flat dict of device arrays (a pytree)
    passed to jitted steps as a regular argument: no re-upload, no recompile
    across calls.  Entity arrays are built once per table; pair arrays
    (drug/prot ordinals + labels, 12 B/pair) once per split.
    """

    def __init__(self, entities: Dict[str, Any], include_llm: bool,
                 emb_ordinals: bool, put):
        self.entities = entities
        self.include_llm = include_llm
        self.emb_ordinals = emb_ordinals
        self._put = put
        self._pairs: Dict[int, Dict[str, Any]] = {}

    @staticmethod
    def supports(loader) -> bool:
        """The gather path feeds compact batches with on-device CM; dense-LLM
        batches (no ordinal store) and grouped CM stay on the host pipeline."""
        return (loader.compact and loader.cm_groups <= 1
                and (not loader.include_llm or loader.emb_ordinals))

    @classmethod
    def build(cls, table, max_nodes: int, seq_len: int,
              include_llm: bool, emb_ordinals: bool,
              sharding=None) -> "DeviceDataStore":
        import jax
        import jax.numpy as jnp

        N = max_nodes
        L = seq_len
        nb = N // 8

        n_drug, n_prot = table.n_drug, table.n_prot
        node_bits = np.zeros((n_drug, N, 10), np.uint8)
        node_ints = np.zeros((n_drug, N, 2), np.int8)
        adj_packed = np.zeros((n_drug, N, nb), np.uint8)
        n_atoms = np.zeros((n_drug,), np.int32)

        # group-64 identity diagonal, shared by every drug (loader eye init)
        cols = np.arange(N)
        eye = np.zeros((N, nb), np.uint8)
        eye[cols, cols % nb] = np.uint8(1) << (cols // nb).astype(np.uint8)

        feats = np.zeros((N, 75), np.int8)
        for o in range(n_drug):
            d = table.drugs[o]
            n = d.n_atoms
            feats[:] = 0
            feats[:n, :74] = d.node_feats
            feats[n:, 74] = 1
            node_bits[o], node_ints[o] = pack_node_feats(feats)
            a = adj_packed[o]
            a[:] = eye
            e0, e1 = d.edges
            np.bitwise_or.at(a, (e0, e1 % nb),
                             np.uint8(1) << (e1 // nb).astype(np.uint8))
            n_atoms[o] = n

        vp = np.zeros((n_prot, L), np.uint8)
        p_fill_start = np.zeros((n_prot,), np.int32)
        for o in range(n_prot):
            p = table.prots[o]
            vp[o] = p.codes
            p_fill_start[o] = p.fill_start

        entities = {
            "node_bits": node_bits, "node_ints": node_ints,
            "adj_packed": adj_packed, "n_atoms": n_atoms,
            "vp": vp, "p_fill_start": p_fill_start,
        }
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jnp.asarray
        return cls({k: put(v) for k, v in entities.items()},
                   include_llm=include_llm, emb_ordinals=emb_ordinals, put=put)

    def tree_for(self, dataset) -> Dict[str, Any]:
        """Merged entity + pair device arrays for one dataset split."""
        key = id(dataset)
        if key not in self._pairs:
            self._pairs[key] = {
                "pair_drug": self._put(dataset.drug_ords.astype(np.int32)),
                "pair_prot": self._put(dataset.prot_ords.astype(np.int32)),
                "pair_label": self._put(dataset.labels.astype(np.float32)),
            }
        return {**self.entities, **self._pairs[key]}

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape, dtype=np.int64)) * v.dtype.itemsize
                   for v in self.entities.values())


def train_index_plan(order: np.ndarray, batch_size: int) -> np.ndarray:
    """(n,) permutation → (n_steps, B) int32, drop_last (BatchLoader parity)."""
    n_steps = len(order) // batch_size
    return order[: n_steps * batch_size].reshape(
        n_steps, batch_size).astype(np.int32)


def eval_index_plan(n: int, batch_size: int):
    """Sequential eval plan: (S, B) indices + float validity mask, ragged
    tail padded by repeating the tail batch's first row (loader parity)."""
    n_steps = -(-n // batch_size)
    idx = np.zeros((n_steps * batch_size,), np.int32)
    idx[:n] = np.arange(n, dtype=np.int32)
    if n_steps * batch_size > n:
        idx[n:] = (n_steps - 1) * batch_size
    valid = (np.arange(n_steps * batch_size) < n).astype(np.float32)
    return idx.reshape(n_steps, batch_size), valid.reshape(n_steps, batch_size)


def gather_compact_batch(tree: Dict[str, Any], idx, valid,
                         include_llm: bool, emb_ordinals: bool,
                         emb_store: Optional[Dict[str, Any]] = None
                         ) -> Dict[str, Any]:
    """Jittable: (B,) pair indices → the compact batch dict BatchLoader's
    _assemble_compact would build for those rows (bit-identical; verified by
    tests/test_device_data.py::test_gather_matches_loader)."""
    import jax.numpy as jnp

    dord = jnp.take(tree["pair_drug"], idx, axis=0)
    pord = jnp.take(tree["pair_prot"], idx, axis=0)
    batch: Dict[str, Any] = {
        "drug_node_bits": jnp.take(tree["node_bits"], dord, axis=0),
        "drug_node_ints": jnp.take(tree["node_ints"], dord, axis=0),
        "drug_adj_packed": jnp.take(tree["adj_packed"], dord, axis=0),
        "n_atoms": jnp.take(tree["n_atoms"], dord, axis=0),
        "vp": jnp.take(tree["vp"], pord, axis=0),
        "p_fill_start": jnp.take(tree["p_fill_start"], pord, axis=0),
        "labels": jnp.take(tree["pair_label"], idx, axis=0),
        "valid": valid.astype(jnp.float32),
    }
    if include_llm:
        if not emb_ordinals or emb_store is None:
            raise ValueError("gather path requires the device embedding "
                             "store for LLM models")
        batch["drug_ord"] = dord
        batch["prot_ord"] = pord
    else:
        # woLLM batches still carry d_ntok; the loader derives it from its
        # embedding source, which for woLLM is always ZeroEmbeddings
        # ((0, nd) rows → d_ntok = 0 for every sample)
        batch["d_ntok"] = jnp.zeros_like(batch["n_atoms"])
    batch["cm"] = cm_arrays_device(pord, dord, batch["labels"])
    return batch
