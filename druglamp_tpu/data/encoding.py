"""Compact batch encoding: minimize host→device bytes, decode on device.

HBM bandwidth and host links are the usual TPU bottleneck; the naive batch
ships ~7 MB/batch of mostly-redundant data (dense uint8 adjacency, one-hot
float features, precomputed fill masks).  The compact form is ~6× smaller:

  drug_adj_packed   (B, N, N/8) uint8   — bit-packed adjacency (bonds + 1·I;
                                          the extra real-atom self-loop is
                                          re-added on device from n_atoms)
  drug_node_feats   (B, N, 75)  int8    — all canonical features are small ints
  vp                (B, L)      uint8   — 27-symbol vocabulary
  p_fill_start      (B,)        int32   — fill mask = positions ≥ start
  d_ntok            (B,)        int32   — drug LLM fill = positions ≥ n_tokens
  n_atoms           (B,)        int32
  (xd/xp stay bf16; labels/valid f32; cm arrays unchanged)

``decode_batch`` runs inside the jitted step (fused, negligible cost) and
reconstructs the standard float batch incl. degrees.  Non-compact batches
pass through untouched, so every entry point accepts either form.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# Packed-adjacency layout: GROUP-64.  For N columns stored in N/8 bytes per
# row, byte c (c < 64·(N/512)… i.e. c < N/8) holds bit g for column
# j = g·64·(N/512)→ concretely  j = g*(N//8) + c,  g ∈ [0,8).
# Chosen over np.packbits' byte-major order because the Pallas GCN kernel
# can then unpack a row tile with strictly 2-D lane ops — concatenate eight
# copies along lanes and shift by (lane // (N//8)) — with no cross-lane
# reshapes, which Mosaic cannot lower for int8.


def pack_adjacency(binary: np.ndarray) -> np.ndarray:
    """(…, N) {0,1} → (…, N/8) uint8 in the group-64 layout."""
    *lead, N = binary.shape
    bb = binary.reshape(*lead, 8, N // 8).astype(np.uint8)
    shifts = np.arange(8, dtype=np.uint8).reshape(8, 1)
    return np.bitwise_or.reduce(bb << shifts, axis=-2)


def unpack_adjacency_np(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_adjacency (host-side)."""
    *lead, nb = packed.shape
    shifts = np.arange(8, dtype=np.uint8).reshape(8, 1)
    bits = (packed[..., None, :] >> shifts) & np.uint8(1)
    return bits.reshape(*lead, 8 * nb)


def compact_batch(batch: Dict[str, Any], n_atoms: np.ndarray) -> Dict[str, Any]:
    """Host-side: convert an assembled float batch to the compact form.

    ``batch['drug_adj']`` must be the effective adjacency (diag 2/1); only
    the binary part (bonds + 1·I) is packed — the real-atom diagonal extra
    is reconstructed from n_atoms on device.
    """
    out = dict(batch)
    adj = batch["drug_adj"]
    binary = (adj > 0).astype(np.uint8)
    out["drug_adj_packed"] = pack_adjacency(binary)
    out["n_atoms"] = n_atoms.astype(np.int32)
    del out["drug_adj"]
    del out["drug_degrees"]
    out["drug_node_feats"] = np.clip(np.rint(batch["drug_node_feats"]),
                                     -128, 127).astype(np.int8)
    out["vp"] = batch["vp"].astype(np.uint8)
    # fill masks → scalars
    p_fill = batch["p_fill"]
    out["p_fill_start"] = np.where(p_fill.any(axis=1),
                                   p_fill.argmax(axis=1),
                                   p_fill.shape[1]).astype(np.int32)
    d_fill = batch["d_fill"]
    out["d_ntok"] = np.where(d_fill.any(axis=1), d_fill.argmax(axis=1),
                             d_fill.shape[1]).astype(np.int32)
    del out["p_fill"]
    del out["d_fill"]
    return out


class BatchFuser:
    """Pack a whole (compact) batch into ONE per-sample byte buffer.

    Every batch array has a leading batch dim; the fuser lays each sample's
    bytes out contiguously in a (B, bytes_per_sample) uint8 buffer, so the
    host→device path is a single DMA per batch instead of ~17 (a large win
    when per-transfer latency is nontrivial), and the buffer shards cleanly
    over the mesh 'data' axis.  ``unfuse`` (jit-traceable) slices and
    bitcasts back to the original arrays on device — pure layout ops.
    """

    def __init__(self, example: Dict[str, Any]):
        flat = _flatten(example)
        self.spec = []
        off = 0
        self.batch = next(iter(flat.values())).shape[0]
        for key in sorted(flat):
            arr = flat[key]
            assert arr.shape[0] == self.batch, (key, arr.shape)
            per = int(np.prod(arr.shape[1:], dtype=np.int64)) * arr.dtype.itemsize
            self.spec.append((key, tuple(arr.shape[1:]), arr.dtype, off, per))
            off += per
        self.bytes_per_sample = off

    def fuse(self, batch: Dict[str, Any]) -> np.ndarray:
        flat = _flatten(batch)
        B = self.batch
        buf = np.empty((B, self.bytes_per_sample), np.uint8)
        for key, shape, dtype, off, per in self.spec:
            src = np.ascontiguousarray(flat[key])
            buf[:, off : off + per] = src.view(np.uint8).reshape(B, per)
        return buf

    def unfuse(self, buf) -> Dict[str, Any]:
        import jax
        import jax.numpy as jnp

        out: Dict[str, Any] = {}
        B = buf.shape[0]
        for key, shape, dtype, off, per in self.spec:
            chunk = jax.lax.slice_in_dim(buf, off, off + per, axis=1)
            jdt = jnp.dtype(dtype)
            if jdt.itemsize == 1:
                arr = chunk.reshape((B,) + shape)
                if jdt == jnp.bool_:
                    arr = arr.astype(bool)
                elif jdt != jnp.uint8:
                    arr = jax.lax.bitcast_convert_type(arr, jdt)
            else:
                arr = jax.lax.bitcast_convert_type(
                    chunk.reshape((B,) + shape + (jdt.itemsize,)), jdt)
            out[key] = arr
        return _unflatten(out)


def _flatten(batch: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in batch.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + k + "."))
        else:
            flat[prefix + k] = v
    return flat


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def decode_batch(batch: Dict[str, Any], store=None,
                 keep_packed: bool = None) -> Dict[str, Any]:
    """Device-side (jit-traceable): expand a compact batch; pass-through if
    the batch is already in standard form.

    ``store``: optional DeviceEmbeddingStore.tree — when the batch carries
    entity ordinals (loader emb_ordinals mode), the frozen LLM embeddings are
    gathered from the device-resident arrays here instead of being shipped
    from host (data/device_store.py).

    ``keep_packed`` (default: auto — true when the Pallas backend is active):
    leave the adjacency bit-packed and emit ``drug_adj`` as
    ``{"packed", "real"}`` for the fused GCN kernel
    (kernels/gcn_pallas.py) instead of materializing the dense (B,N,N)
    matrix every step; degrees come from a popcount."""
    if "drug_adj_packed" not in batch:
        return batch
    import jax.numpy as jnp

    out = dict(batch)
    if store is not None and "drug_ord" in batch:
        dor = batch["drug_ord"]
        por = batch["prot_ord"]
        out["xd"] = jnp.take(store["drug_emb"], dor, axis=0)
        out["d_ntok"] = jnp.take(store["drug_len"], dor, axis=0)
        out["xp_src"] = jnp.take(store["prot_emb"], por, axis=0)
        out["xp_len"] = jnp.take(store["prot_len"], por, axis=0)
        del out["drug_ord"], out["prot_ord"]
        batch = out
    packed = batch["drug_adj_packed"]
    B, N, _ = packed.shape
    n_atoms = batch["n_atoms"]
    idx = jnp.arange(N)
    real = (idx[None, :] < n_atoms[:, None])                   # (B,N)
    if keep_packed is None:
        from druglamp_tpu.kernels.gcn_pallas import use_packed_gcn

        keep_packed = use_packed_gcn()
    if keep_packed:
        from druglamp_tpu.kernels.gcn_pallas import packed_degrees

        realf = real.astype(jnp.float32)
        out["drug_adj"] = {"packed": packed, "real": realf}
        out["drug_degrees"] = packed_degrees(packed, realf)
    else:
        shifts = jnp.arange(8, dtype=jnp.uint8)[:, None]       # group-64
        bits = (packed[:, :, None, :] >> shifts) & jnp.uint8(1)  # (B,N,8,N/8)
        adj = bits.reshape(B, N, -1)                           # (B,N,N) {0,1}
        eye = jnp.eye(N, dtype=adj.dtype)
        adj = adj + eye[None] * real[:, :, None].astype(adj.dtype)  # diag 2 real
        out["drug_adj"] = adj
        out["drug_degrees"] = adj.sum(axis=2).astype(jnp.float32)
    out["drug_node_feats"] = batch["drug_node_feats"].astype(jnp.float32)
    out["vp"] = batch["vp"].astype(jnp.int32)
    L = out["vp"].shape[1]
    out["p_fill"] = (jnp.arange(L)[None, :] >= batch["p_fill_start"][:, None]
                     ).astype(jnp.float32)
    out["d_fill"] = (idx[None, :] >= batch["d_ntok"][:, None]).astype(jnp.float32)
    if "xp_src" in batch:
        # device-side repeat_pad: position p takes src row (p mod span) while
        # p < quot*span, else 0  (span = xp_len rows, quot = L // span)
        src = batch["xp_src"]                                 # (B, Lp, D)
        span = jnp.maximum(batch["xp_len"], 1)[:, None]       # (B, 1)
        pos = jnp.arange(L)[None, :]                          # (1, L)
        quot = L // span
        r = pos % span
        valid = pos < quot * span
        gathered = jnp.take_along_axis(src, r[:, :, None], axis=1)
        out["xp"] = jnp.where(valid[:, :, None], gathered,
                              jnp.zeros((), src.dtype))
        del out["xp_src"], out["xp_len"]
    for k in ("drug_adj_packed", "n_atoms", "p_fill_start", "d_ntok"):
        del out[k]
    return out
