"""Fused device→host pytree fetch.

Through a tunneled/remote runtime every per-leaf ``np.asarray`` is a fetch
round-trip, and even with ``copy_to_host_async`` pre-issued the per-buffer
protocol overhead dominates for trees with hundreds of small leaves (a full
TrainState snapshot measured ~7–8 s).  ``device_fetch_tree`` packs every
leaf into ONE uint8 buffer inside a jitted program (bitcasts + concat —
pure layout ops) and performs a single D2H fetch, then rebuilds numpy
arrays host-side by slicing views.  The inverse trick of
data/encoding.BatchFuser, pointed device→host.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

_PACK_CACHE: Dict[Tuple, Any] = {}


def _leaf_sig(leaf) -> Tuple:
    # np.dtype objects are hashable and round-trip ml_dtypes (bfloat16)
    return (tuple(leaf.shape), np.dtype(leaf.dtype))


def _build_packer(sigs):
    import jax
    import jax.numpy as jnp

    def pack(leaves):
        chunks = []
        for leaf, (shape, dt) in zip(leaves, sigs):
            x = jnp.reshape(leaf, (-1,))
            if dt == np.bool_:
                x = x.astype(jnp.uint8)
            elif dt.itemsize == 1:
                x = jax.lax.bitcast_convert_type(x, jnp.uint8)
            else:
                x = jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)
            chunks.append(x)
        return jnp.concatenate(chunks) if chunks else jnp.zeros((0,), jnp.uint8)

    return jax.jit(pack)


def device_fetch_tree(tree):
    """Fetch a pytree of device arrays to host numpy with ONE D2H transfer.

    Falls back to per-leaf fetch (with overlapped async copies) on any
    packing failure — correctness never depends on the fast path.
    """
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    try:
        sigs = tuple(_leaf_sig(l) for l in leaves)
        packer = _PACK_CACHE.get(sigs)
        if packer is None:
            packer = _build_packer(sigs)
            _PACK_CACHE[sigs] = packer
        buf = np.asarray(packer(leaves))          # single fetch
        out = []
        off = 0
        for shape, dt in sigs:
            n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
            view = buf[off : off + n]
            if dt == np.bool_:
                arr = view.view(np.uint8).astype(bool).reshape(shape)
            else:
                arr = view.view(dt).reshape(shape)
            out.append(arr)
            off += n
        return jax.tree.unflatten(treedef, out)
    except Exception:
        for leaf in leaves:
            try:
                leaf.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                break
        return jax.tree.map(np.asarray, tree)
