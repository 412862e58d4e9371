"""DrugLAMP base model — owns every submodule and the loss heads.

Reference model/basic_model.py:57-121 (DrugLAMPBase).  Differences by design:

- Graphs arrive as dense padded arrays (node_feats/adj/degrees), not DGL
  graphs; fill bits are computed host-side from sequence lengths (identical
  to the reference's ``xp.sum(-1) == 0`` test on the frozen-embedding rows,
  model/DrugLAMP.py:11-19) and shipped in the batch.
- The SSL and CM losses are separate *methods* invoked via
  ``model.apply(..., method='ssl_loss' / 'cm_loss')`` so the trainer can jit
  one function per epoch-gate combination (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.config import Config
from druglamp_tpu.models.cm import CrossModality
from druglamp_tpu.models.ssl import SSL
from druglamp_tpu.nn.gca import GuidedCrossAttention
from druglamp_tpu.nn.layers import TorchDense
from druglamp_tpu.nn.mhla import MultiHeadLinearAttention
from druglamp_tpu.nn.mlp import FeedForwardLayer, MLPClassifier
from druglamp_tpu.nn.gcn import MolecularGCN
from druglamp_tpu.nn.pmma import PairedMultimodalAttention
from druglamp_tpu.nn.protein_cnn import ProteinCNN


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class DrugLAMPBase(nn.Module):
    """Shared trunk; subclasses implement __call__ (forward variants)."""

    n_drug_feature: int = 384   # ChemBERTa hidden size (LLM-dim sidecar)
    n_prot_feature: int = 640   # ESM-2 embed dim
    n_hidden: int = 128
    config: Config = Config()
    compute_dtype: Any = jnp.float32
    vis: bool = False                 # return PMMA attention maps (eval/vis)
    pmma_variant: str = "pmma"        # or 'linattn' (LinAttnEncoder alternative)
    bn_groups: int = 1                # >1: per-replica BN stats (torch-DDP emulation)

    def setup(self):
        cfg = self.config
        nh = self.n_hidden
        self.site_len = cfg.protein.site_len
        self.seq_len_q = cfg.protein.seq_len

        self.drug_extractor = MolecularGCN(
            in_feats=cfg.drug.node_in_feats, dim_embedding=nh,
            hidden_feats=(nh,) * 3, padding=cfg.drug.padding,
            dtype=self.compute_dtype, bn_groups=self.bn_groups)
        self.protein_extractor = ProteinCNN(
            embedding_dim=nh, num_filters=(nh,) * 3,
            kernel_size=tuple(cfg.protein.kernel_size), padding=cfg.protein.padding,
            dtype=self.compute_dtype, bn_groups=self.bn_groups)

        self.ssl_model = SSL(prot_extractor=self.protein_extractor,
                             n_prot_feature=self.n_prot_feature,
                             drug_ssl_type="simsiam", n_hidden=nh,
                             bn_groups=self.bn_groups)
        self.cm_model = CrossModality(hidden_size=nh, groups=self.bn_groups)

        # Drug LLM adaptor
        self.lin_d1 = TorchDense(2 * nh, name="lin_d1")
        self.d_norm = nn.LayerNorm(epsilon=1e-5, name="d_norm")
        self.lin_d2 = TorchDense(nh, name="lin_d2")

        # Protein LLM adaptor
        self.p_adaptor_wo_skip_connect = FeedForwardLayer(nh, name="p_adaptor")
        self.lin_p1 = TorchDense(2 * nh, name="lin_p1")
        self.p_norm = nn.LayerNorm(epsilon=1e-5, name="p_norm")
        self.lin_p2 = TorchDense(nh, name="lin_p2")

        pmma_cfg = cfg.pmma
        self.v_gca = GuidedCrossAttention(embed_dim=nh, num_heads=1, dtype=self.compute_dtype)
        self.v_mhla = MultiHeadLinearAttention(d_model=2 * nh, d_diff=8 * nh, nhead=8,
                                               dropout=pmma_cfg.mlha_dropout,
                                               activation="gelu", dtype=self.compute_dtype)
        self.v_gca_norm = nn.LayerNorm(epsilon=1e-5, name="v_gca_norm")
        self.x_gca = GuidedCrossAttention(embed_dim=nh, num_heads=1, dtype=self.compute_dtype)
        self.x_mhla = MultiHeadLinearAttention(d_model=2 * nh, d_diff=8 * nh, nhead=8,
                                               dropout=pmma_cfg.mlha_dropout,
                                               activation="gelu", dtype=self.compute_dtype)
        self.x_gca_norm = nn.LayerNorm(epsilon=1e-5, name="x_gca_norm")

        self.pmma = PairedMultimodalAttention(
            hidden_size=pmma_cfg.hidden_size, num_heads=pmma_cfg.num_heads,
            num_layers=pmma_cfg.num_layers, feat_len=pmma_cfg.feat_len,
            mol_len=pmma_cfg.mol_len, dropout_rate=pmma_cfg.dropout_rate,
            dtype=self.compute_dtype, vis=self.vis, variant=self.pmma_variant)

        dec = cfg.decoder
        self.mlp_classifier = MLPClassifier(in_dim=dec.in_dim * 2,
                                            hidden_dim=dec.hidden_dim * 2,
                                            out_dim=dec.out_dim * 2,
                                            binary=dec.binary,
                                            bn_groups=self.bn_groups)

    # --- shared forward pieces ---------------------------------------------

    def _site_pool(self, x):
        """(B, 2304, C) → (B, 256, C): mean over the 9 tiled 'sites'."""
        B, L, C = x.shape
        site_seq_len = self.seq_len_q // self.site_len
        return x.reshape(B, self.site_len, site_seq_len, C).mean(axis=1)

    def _encode_prot_llm(self, xp):
        hx = xp
        xp = self.p_adaptor_wo_skip_connect(xp) + hx
        xp = self.p_norm(_gelu(self.lin_p1(xp)))
        return self.lin_p2(xp)

    def _encode_drug_llm(self, xd):
        xd = self.d_norm(_gelu(self.lin_d1(xd)))
        return self.lin_d2(xd)

    def _fuse_v(self, vp, vd, train: bool, need_raw: bool):
        mv, A_v = self.v_gca(vp, vd, vd, need_raw=need_raw)
        mv = jnp.concatenate([vp, mv], axis=2)
        mv = self.v_mhla(mv, train=train) + mv
        return self.v_gca_norm(mv), A_v

    def _fuse_x(self, xp, xd, train: bool, need_raw: bool):
        mx, A_x = self.x_gca(xp, xd, xd, need_raw=need_raw)
        mx = jnp.concatenate([xp, mx], axis=2)
        mx = self.x_mhla(mx, train=train) + mx
        return self.x_gca_norm(mx), A_x

    def _classify(self, f, train: bool):
        f = f.mean(axis=1)
        return self.mlp_classifier(f.astype(jnp.float32), train=train)

    # --- auxiliary loss heads (invoked via apply(..., method=...)) ---------

    def ssl_loss(self, ssl_inputs: Dict[str, Any], rng, train: bool = True):
        # p_mode 'vp' when the LLM stream is absent (DrugLAMPwoLLM), else 'double'
        p_mode = "vp" if ssl_inputs["xp"] is None else "double"
        return self.ssl_model(ssl_inputs["vp"], ssl_inputs["xp"],
                              ssl_inputs["fill_bit_p"], ssl_inputs["vd"],
                              ssl_inputs["xd"], rng, p_mode=p_mode, train=train)

    def init_all(self, batch: Dict[str, Any], rng):
        """Initialization-only path: touches every submodule (forward + SSL +
        CM heads) so the full parameter tree materializes — flax creates
        params lazily per traced call, and the aux heads are invoked through
        separate methods at train time."""
        out = self.__call__(batch, train=False)
        ssl = self.ssl_loss(out["ssl_inputs"], rng, train=False)
        cm_inputs = out["cm_inputs"] or {"prot": out["vp"], "aug_prot": out["vp"],
                                         "drug": out["vd"], "aug_drug": out["vd"]}
        B = batch["labels"].shape[0]
        g = self.bn_groups
        shp = (g, B // g) if g > 1 else (B,)
        gt_arrays = {
            "p_index": jnp.zeros(shp, jnp.int32),
            "p_valid": jnp.ones(shp, bool),
            "d_index": jnp.zeros(shp, jnp.int32),
            "d_valid": jnp.ones(shp, bool),
            "gt": jnp.zeros(shp + (shp[-1],), jnp.float32),
        }
        cm = self.cm_loss(cm_inputs, gt_arrays, 0.5, train=False)
        return out, ssl, cm

    def cm_loss(self, cm_inputs: Dict[str, Any], gt_arrays: Dict[str, Any],
                margin, train: bool = True):
        return self.cm_model(cm_inputs["prot"], cm_inputs["aug_prot"],
                             cm_inputs["drug"], cm_inputs["aug_drug"],
                             gt_arrays["p_index"], gt_arrays["p_valid"],
                             gt_arrays["d_index"], gt_arrays["d_valid"],
                             gt_arrays["gt"], margin, train=train)
