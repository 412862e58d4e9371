"""Tensor-parallel sharding for the frozen encoders.

esm2_t48_15B does not fit a single chip (SURVEY §2: the one genuine
TP/FSDP-shaped need).  Every Dense kernel in encoders/esm2.py carries logical
axis names via ``nn.with_logical_partitioning``; this module maps them onto a
mesh:

    embed       → replicated
    model_heads → 'model'   (column-parallel QKV / fc1)
    model_ffn   → 'model'

XLA inserts the all-gather/reduce-scatter pair per layer over ICI.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOGICAL_RULES = (
    ("embed", None),
    ("model_heads", "model"),
    ("model_ffn", "model"),
)


def shard_encoder_variables(variables: Dict[str, Any], mesh: Mesh):
    """Place (possibly logically-annotated) encoder variables on the mesh.

    Works with both boxed params (fresh ``model.init`` — nn.Partitioned
    leaves carry the logical names) and plain converted checkpoints (which
    are simply replicated).
    """
    logical_specs = nn.get_partition_spec(variables)
    shardings = nn.logical_to_mesh_sharding(logical_specs, mesh, LOGICAL_RULES)

    def put(x, s):
        if s is None:
            s = NamedSharding(mesh, P())
        return jax.device_put(x, s)

    return jax.tree.map(put, variables, shardings,
                        is_leaf=lambda x: isinstance(x, nn.Partitioned))
