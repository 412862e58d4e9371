"""Torch checkpoint → flax params converters for the frozen encoders.

Supports both HF transformers naming (EsmModel / RobertaModel state_dicts)
and fair-esm naming for ESM-2.  No network access is assumed: callers pass a
state_dict already on disk (torch.load) or an in-memory torch module.
Kernel convention: torch Linear weight (out, in) → flax kernel (in, out).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32).T


def _a(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _sd(state_dict) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in state_dict.items()}


def esm2_params_from_torch(state_dict, num_layers: int) -> Dict[str, Any]:
    """HF EsmModel (``esm.``-prefixed or bare) or fair-esm state_dict → params."""
    sd = _sd(state_dict)

    def find(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
            for prefix in ("esm.", "model."):
                if prefix + c in sd:
                    return sd[prefix + c]
        raise KeyError(f"none of {cands} in checkpoint (have e.g. "
                       f"{sorted(sd)[:5]}...)")

    params: Dict[str, Any] = {
        "embed_tokens": {"embedding": _a(find("embeddings.word_embeddings.weight",
                                              "embed_tokens.weight"))},
        "emb_layer_norm_after": {
            "scale": _a(find("encoder.emb_layer_norm_after.weight",
                             "emb_layer_norm_after.weight")),
            "bias": _a(find("encoder.emb_layer_norm_after.bias",
                            "emb_layer_norm_after.bias")),
        },
    }
    for i in range(num_layers):
        hf = f"encoder.layer.{i}."
        fe = f"layers.{i}."

        def fl(hf_suffix, fe_suffix):
            return find(hf + hf_suffix, fe + fe_suffix)

        layer = {
            "self_attn": {
                "q_proj": {"kernel": _t(fl("attention.self.query.weight",
                                           "self_attn.q_proj.weight")),
                           "bias": _a(fl("attention.self.query.bias",
                                         "self_attn.q_proj.bias"))},
                "k_proj": {"kernel": _t(fl("attention.self.key.weight",
                                           "self_attn.k_proj.weight")),
                           "bias": _a(fl("attention.self.key.bias",
                                         "self_attn.k_proj.bias"))},
                "v_proj": {"kernel": _t(fl("attention.self.value.weight",
                                           "self_attn.v_proj.weight")),
                           "bias": _a(fl("attention.self.value.bias",
                                         "self_attn.v_proj.bias"))},
                "out_proj": {"kernel": _t(fl("attention.output.dense.weight",
                                             "self_attn.out_proj.weight")),
                             "bias": _a(fl("attention.output.dense.bias",
                                           "self_attn.out_proj.bias"))},
            },
            "self_attn_layer_norm": {
                "scale": _a(fl("attention.LayerNorm.weight",
                               "self_attn_layer_norm.weight")),
                "bias": _a(fl("attention.LayerNorm.bias",
                              "self_attn_layer_norm.bias"))},
            "fc1": {"kernel": _t(fl("intermediate.dense.weight", "fc1.weight")),
                    "bias": _a(fl("intermediate.dense.bias", "fc1.bias"))},
            "fc2": {"kernel": _t(fl("output.dense.weight", "fc2.weight")),
                    "bias": _a(fl("output.dense.bias", "fc2.bias"))},
            "final_layer_norm": {
                "scale": _a(fl("LayerNorm.weight", "final_layer_norm.weight")),
                "bias": _a(fl("LayerNorm.bias", "final_layer_norm.bias"))},
        }
        params[f"layer_{i}"] = layer
    return params


def chemberta_params_from_torch(state_dict, num_layers: int) -> Dict[str, Any]:
    """HF RobertaModel state_dict (``roberta.``-prefixed or bare) → params."""
    sd = _sd(state_dict)

    def find(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
            for prefix in ("roberta.", "model."):
                if prefix + c in sd:
                    return sd[prefix + c]
        raise KeyError(f"none of {cands} in checkpoint")

    params: Dict[str, Any] = {
        "word_embeddings": {"embedding": _a(find("embeddings.word_embeddings.weight"))},
        "position_embeddings": {"embedding": _a(find("embeddings.position_embeddings.weight"))},
        "token_type_embedding": _a(find("embeddings.token_type_embeddings.weight"))[0],
        "emb_norm": {"scale": _a(find("embeddings.LayerNorm.weight")),
                     "bias": _a(find("embeddings.LayerNorm.bias"))},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": _t(find(p + "attention.self.query.weight")),
                          "bias": _a(find(p + "attention.self.query.bias"))},
                "key": {"kernel": _t(find(p + "attention.self.key.weight")),
                        "bias": _a(find(p + "attention.self.key.bias"))},
                "value": {"kernel": _t(find(p + "attention.self.value.weight")),
                          "bias": _a(find(p + "attention.self.value.bias"))},
            },
            "attention_output": {"kernel": _t(find(p + "attention.output.dense.weight")),
                                 "bias": _a(find(p + "attention.output.dense.bias"))},
            "attention_norm": {"scale": _a(find(p + "attention.output.LayerNorm.weight")),
                               "bias": _a(find(p + "attention.output.LayerNorm.bias"))},
            "intermediate": {"kernel": _t(find(p + "intermediate.dense.weight")),
                             "bias": _a(find(p + "intermediate.dense.bias"))},
            "output": {"kernel": _t(find(p + "output.dense.weight")),
                       "bias": _a(find(p + "output.dense.bias"))},
            "output_norm": {"scale": _a(find(p + "output.LayerNorm.weight")),
                            "bias": _a(find(p + "output.LayerNorm.bias"))},
        }
    return params
