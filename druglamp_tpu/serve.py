"""Inference API: load a trained checkpoint, score (SMILES, protein) pairs.

The reference has no serving path (inference only happens inside
trainer.test_step); this is a framework addition for deployment:

    predictor = Predictor.from_checkpoint(work_dir, model_name="DrugLAMPwoLLM")
    probs = predictor.predict_pairs([(smiles, protein_seq), ...])

Featurization runs on host (native C++ runtime when built), scoring runs as
one jitted batched forward per fixed-size chunk; attention maps are available
via ``predict_pairs(..., return_attn=True)`` for interpretability
(the reference's get_cross_attn_mat / get_inter_attn_mat capability,
basic_model.py:123-132).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from druglamp_tpu.config import Config
from druglamp_tpu.data.cache import ZeroEmbeddings
from druglamp_tpu.data.dataset import featurize_drug, featurize_prot
from druglamp_tpu.models.registry import build_model


class Predictor:
    def __init__(self, model, params, batch_stats, cfg: Config, embeddings=None,
                 batch_size: int = 32):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.cfg = cfg
        self.emb = embeddings or ZeroEmbeddings(model.n_drug_feature,
                                                model.n_prot_feature)
        self.batch_size = batch_size
        self._fwd = jax.jit(lambda v, b: self.model.apply(v, b, train=False)["score"])
        self._fwd_attn = jax.jit(
            lambda v, b: self.model.apply(v, b, train=False, need_attn=True))

    @classmethod
    def from_checkpoint(cls, work_dir: str, model_name: str = "DrugLAMP",
                        cfg: Optional[Config] = None, which: str = "best",
                        n_drug_feature: int = 384, n_prot_feature: int = 640,
                        embeddings=None, batch_size: int = 32) -> "Predictor":
        import orbax.checkpoint as ocp

        cfg = cfg or Config()
        model = build_model(model_name, cfg, n_drug_feature, n_prot_feature)
        path = os.path.join(os.path.abspath(work_dir), f"ckpt_{which}")
        restored = ocp.PyTreeCheckpointer().restore(path)
        tree = restored["state"]
        return cls(model, tree["params"], tree["batch_stats"], cfg,
                   embeddings=embeddings, batch_size=batch_size)

    # --- featurization -------------------------------------------------------

    def _featurize(self, pairs: Sequence[Tuple[str, str]]) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        N = cfg.drug.max_nodes
        L = cfg.protein.seq_len
        B = len(pairs)
        nd, npf = self.emb.n_drug_feature, self.emb.n_prot_feature
        batch = {
            "drug_node_feats": np.zeros((B, N, 75), np.float32),
            "drug_adj": np.zeros((B, N, N), np.uint8),
            "drug_degrees": np.zeros((B, N), np.float32),
            "vp": np.zeros((B, L), np.int32),
            "p_fill": np.zeros((B, L), np.float32),
            "d_fill": np.ones((B, N), np.float32),
            "xd": np.zeros((B, N, nd), np.float32),
            "xp": np.zeros((B, L, npf), np.float32),
            "labels": np.zeros((B,), np.float32),
            "valid": np.ones((B,), np.float32),
        }
        ar = np.arange(N)
        for b, (smi, seq) in enumerate(pairs):
            drec = featurize_drug(smi, b, N)
            prec = featurize_prot(seq, b, cfg.protein.max_resis, L)
            n = drec.n_atoms
            batch["drug_node_feats"][b, :n, :74] = drec.node_feats
            batch["drug_node_feats"][b, n:, 74] = 1.0
            adj = batch["drug_adj"][b]
            adj[drec.edges[0], drec.edges[1]] = 1
            adj[ar, ar] = 1
            adj[ar[:n], ar[:n]] = 2
            batch["drug_degrees"][b] = adj.sum(1)
            batch["vp"][b] = prec.codes
            batch["p_fill"][b, prec.fill_start:] = 1.0
        return batch

    # --- scoring -------------------------------------------------------------

    def predict_pairs(self, pairs: Sequence[Tuple[str, str]],
                      return_attn: bool = False):
        """Probabilities (N,) for each (SMILES, protein) pair; optionally the
        PGCA raw attention logits per chunk."""
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        probs: List[np.ndarray] = []
        attns: List[np.ndarray] = []
        bs = self.batch_size
        for s in range(0, len(pairs), bs):
            chunk = list(pairs[s : s + bs])
            n_real = len(chunk)
            while len(chunk) < bs:           # fixed shapes → no recompiles
                chunk.append(chunk[0])
            batch = jax.tree.map(jnp.asarray, self._featurize(chunk))
            if return_attn:
                out = self._fwd_attn(variables, batch)
                score = out["score"]
                attns.append(np.asarray(out["A_v_gca"])[:n_real])
            else:
                score = self._fwd(variables, batch)
            probs.append(np.asarray(jax.nn.sigmoid(score[:, 0]))[:n_real])
        p = np.concatenate(probs) if probs else np.zeros((0,))
        if return_attn:
            return p, (np.concatenate(attns) if attns else None)
        return p
