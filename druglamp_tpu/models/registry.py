"""Model registry (replaces the reflection-based MInterface,
reference model/model_interface.py:10-34, with an explicit mapping)."""

from __future__ import annotations

from typing import Dict, Type

import jax.numpy as jnp

from druglamp_tpu.config import Config
from druglamp_tpu.models.druglamp import DrugLAMP, DrugLAMP2C2P, DrugLAMPwoLLM

MODEL_REGISTRY: Dict[str, Type] = {
    "DrugLAMP": DrugLAMP,
    "DrugLAMPwoLLM": DrugLAMPwoLLM,
    "DrugLAMP2C2P": DrugLAMP2C2P,
}


def get_model_class(name: str) -> Type:
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")


def build_model(name: str, cfg: Config, n_drug_feature: int = 384,
                n_prot_feature: int = 640, vis: bool = False,
                pmma_variant: str = "pmma", bn_groups: int = 1):
    cls = get_model_class(name)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.solver.compute_dtype]
    return cls(n_drug_feature=n_drug_feature, n_prot_feature=n_prot_feature,
               n_hidden=cfg.n_hidden, config=cfg, compute_dtype=dtype,
               vis=vis, pmma_variant=pmma_variant, bn_groups=bn_groups)
