"""Device-mesh parallelism.

The reference's only distribution strategy is data parallelism via Lightning
DDP/NCCL (trainer.py:146-147); its "find_unused_parameters" workaround exists
because gated aux losses leave grads undefined on some steps.  The TPU-native
equivalent is single-program DP over the ICI mesh: batches sharded along a
``data`` axis, parameters replicated, gradients reduced by XLA-inserted
collectives inside the jitted step (SURVEY §5.8) — no NCCL, no process
groups, no unused-parameter problem (gated losses are separate jit variants).

Beyond the reference, a ``model`` axis provides tensor parallelism for the
wide layers (PMMA width-512 blocks, the MLP head, and the frozen-encoder
stacks — ESM-2 15B does not fit one chip): selected kernels are sharded on
their output/input dims and XLA inserts all-gathers/reduce-scatters over ICI.

Everything uses `jax.jit` + `NamedSharding` (auto-propagation), the
recommended replacement for pmap/xmap.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_model: int = 1, devices=None) -> Mesh:
    """(data, model) mesh over all (or given) devices; model axis innermost
    so tensor-parallel collectives ride the fastest ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n_total = devices.size
    assert n_total % n_model == 0, f"{n_total} devices not divisible by model={n_model}"
    grid = devices.reshape(n_total // n_model, n_model)
    return Mesh(grid, ("data", "model"))


# Parameters whose kernels shard over the model axis (tensor parallel).
# Matched against the '/'-joined param path.  Column-parallel (output dim)
# for up-projections, row-parallel (input dim) for down-projections — the
# classic Megatron layout: one all-reduce per block, inserted by XLA.
_TP_RULES = [
    (re.compile(r"ffn(_mol)?/fc1/kernel$"), P(None, "model")),
    (re.compile(r"ffn(_mol)?/fc2/kernel$"), P("model", None)),
    (re.compile(r"mlp_classifier/fc1/kernel$"), P(None, "model")),
    (re.compile(r"mlp_classifier/fc2/kernel$"), P("model", None)),
    (re.compile(r"attn/(query|key|value)(_mol)?/kernel$"), P(None, "model")),
    (re.compile(r"attn/out(_mol)?/kernel$"), P("model", None)),
]


def param_spec(path: str, shape, tp: bool) -> P:
    if tp and len(shape) == 2:
        for pat, spec in _TP_RULES:
            if pat.search(path):
                # only shard if the dimension divides evenly
                return spec
    return P()


class MeshContext:
    """Bundles a mesh with shard/replicate helpers for the trainer."""

    def __init__(self, mesh: Optional[Mesh] = None, tensor_parallel: bool = False):
        self.mesh = mesh if mesh is not None else make_mesh(1)
        self.tp = tensor_parallel and self.mesh.shape["model"] > 1
        self._fusers: Dict[int, Any] = {}
        self._unfuse_jits: Dict[int, Any] = {}

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    def replicate(self, tree):
        """Place a pytree fully replicated on the mesh."""
        s = NamedSharding(self.mesh, P())
        return jax.device_put(tree, s)

    def shard_params(self, params):
        """Place params per TP rules (replicated when no rule matches)."""
        flat = jax.tree_util.tree_flatten_with_path(params)[0]

        def place(path, leaf):
            pstr = "/".join(getattr(k, "key", str(k)) for k in path)
            spec = param_spec(pstr, getattr(leaf, "shape", ()), self.tp)
            if spec != P():
                # guard: uneven shards fall back to replication
                dims = spec
                for d, name in zip(leaf.shape, dims):
                    if name == "model" and d % self.mesh.shape["model"] != 0:
                        spec = P()
                        break
            return jax.device_put(leaf, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map_with_path(place, params)

    def shard_state(self, state):
        """Replicate a TrainState (params optionally TP-sharded)."""
        if not self.tp:
            return self.replicate(state)
        return state.replace(
            params=self.shard_params(state.params),
            batch_stats=self.replicate(state.batch_stats),
            opt_cls=self.replicate(state.opt_cls),
            opt_ssl=self.replicate(state.opt_ssl) if state.opt_ssl is not None else None,
            opt_cm=self.replicate(state.opt_cm) if state.opt_cm is not None else None,
            step=self.replicate(state.step),
        )

    def shard_batch(self, batch: Dict[str, Any]):
        """Batch-dim sharding over the data axis (scalars replicated)."""
        data_s = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())

        def place(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % self.n_data == 0:
                return jax.device_put(x, data_s)
            return jax.device_put(x, repl)

        return jax.tree.map(place, batch)

    def shard_stacked_batch(self, stacked: Dict[str, Any]):
        """Place a step-stacked batch (leading axis = scan step, axis 1 =
        sample) with the sample axis sharded over 'data'.  One transfer per
        leaf — per-transfer latency is already amortized by the stacking."""
        data_s = NamedSharding(self.mesh, P(None, "data"))
        repl = NamedSharding(self.mesh, P())

        def place(x):
            if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[1] % self.n_data == 0:
                return jax.device_put(x, data_s)
            return jax.device_put(x, repl)

        return jax.tree.map(place, stacked)

    def fused_shard_batch(self, batch: Dict[str, Any]):
        """One-DMA batch transfer: pack all arrays into a single per-sample
        byte buffer on host, ship it sharded over 'data', unfuse on device
        (data/encoding.BatchFuser).  Falls back to per-leaf placement when
        the batch dim doesn't divide the data axis (ragged eval cases are
        padded upstream, so this is rare)."""
        import numpy as np

        from druglamp_tpu.data.encoding import BatchFuser

        B = batch["labels"].shape[0]
        if B % self.n_data != 0 or any(
                not hasattr(v, "shape") for v in batch.values()):
            return self.shard_batch(batch)
        key = B
        fuser = self._fusers.get(key)
        if fuser is None or [k for k, *_ in fuser.spec] != sorted(
                self._flat_keys(batch)):
            fuser = BatchFuser(batch)
            unfuse = jax.jit(fuser.unfuse)
            self._fusers[key] = fuser
            self._unfuse_jits[key] = unfuse
        buf = fuser.fuse(batch)
        dev = jax.device_put(buf, NamedSharding(self.mesh, P("data")))
        return self._unfuse_jits[key](dev)

    @staticmethod
    def _flat_keys(batch):
        from druglamp_tpu.data.encoding import _flatten

        return sorted(_flatten(batch).keys())
