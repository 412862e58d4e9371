"""Model zoo forward variants (reference model/DrugLAMP{,woLLM,2C2P}.py).

All variants consume the fixed-shape batch dict from data/loader.py:

  drug_node_feats (B,512,75) f32   drug_adj (B,512,512) u8   drug_degrees (B,512)
  vp (B,2304) i32                  p_fill (B,2304) f32       d_fill (B,512) f32
  xd (B,512,384) f32               xp (B,2304,640) f32       labels (B,)

and return a dict:  score (B,1), ssl_inputs, cm_inputs, attn artifacts.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from druglamp_tpu.models.base import DrugLAMPBase


class DrugLAMP(DrugLAMPBase):
    """Full 4-stream model (reference model/DrugLAMP.py:8-79)."""

    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 need_attn: bool = False) -> Dict[str, Any]:
        vd = self.drug_extractor(batch["drug_node_feats"], batch["drug_adj"],
                                 batch["drug_degrees"], train=train)

        fill_bit_p = batch["p_fill"]
        fill_bit_d = batch["d_fill"]
        xp = jnp.concatenate(
            [batch["xp"], fill_bit_p[..., None].astype(batch["xp"].dtype)], axis=-1)
        xd = jnp.concatenate(
            [batch["xd"], fill_bit_d[..., None].astype(batch["xd"].dtype)], axis=-1)

        ssl_inputs = {"vp": batch["vp"], "xp": xp, "fill_bit_p": fill_bit_p,
                      "vd": vd, "xd": xd}

        vp = self.protein_extractor(batch["vp"], fill_bit_p, train=train)
        vp = self._site_pool(vp)
        xp = self._site_pool(xp)

        xp = self._encode_prot_llm(xp)
        xd = self._encode_drug_llm(xd)

        mv, A_v = self._fuse_v(vp, vd, train=train, need_raw=need_attn)
        mx, A_x = self._fuse_x(xp, xd, train=train, need_raw=need_attn)

        f, attn, guided_attn = self.pmma(mx, mv, train=train)
        score = self._classify(f, train=train)
        return {"score": score, "ssl_inputs": ssl_inputs, "cm_inputs": None,
                "A_v_gca": A_v, "A_x_gca": A_x, "attn": attn,
                "guided_attn": guided_attn, "vd": vd, "vp": vp}


class DrugLAMPwoLLM(DrugLAMPBase):
    """Graph+CNN streams only; PMMA runs (mv, mv) (reference DrugLAMPwoLLM.py)."""

    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 need_attn: bool = False) -> Dict[str, Any]:
        vd = self.drug_extractor(batch["drug_node_feats"], batch["drug_adj"],
                                 batch["drug_degrees"], train=train)
        fill_bit_p = batch["p_fill"]

        ssl_inputs = {"vp": batch["vp"], "xp": None, "fill_bit_p": fill_bit_p,
                      "vd": vd, "xd": None}

        vp = self.protein_extractor(batch["vp"], fill_bit_p, train=train)
        vp = self._site_pool(vp)

        mv, A_v = self._fuse_v(vp, vd, train=train, need_raw=need_attn)

        f, attn, guided_attn = self.pmma(mv, mv, train=train)
        score = self._classify(f, train=train)
        return {"score": score, "ssl_inputs": ssl_inputs, "cm_inputs": None,
                "A_v_gca": A_v, "A_x_gca": None, "attn": attn,
                "guided_attn": guided_attn, "vd": vd, "vp": vp}


class DrugLAMP2C2P(DrugLAMPBase):
    """DrugLAMP + cross-modality inputs (reference DrugLAMP2C2P.py:54-63)."""

    def __call__(self, batch: Dict[str, Any], train: bool = False,
                 need_attn: bool = False) -> Dict[str, Any]:
        vd = self.drug_extractor(batch["drug_node_feats"], batch["drug_adj"],
                                 batch["drug_degrees"], train=train)

        fill_bit_p = batch["p_fill"]
        fill_bit_d = batch["d_fill"]
        xp = jnp.concatenate(
            [batch["xp"], fill_bit_p[..., None].astype(batch["xp"].dtype)], axis=-1)
        xd = jnp.concatenate(
            [batch["xd"], fill_bit_d[..., None].astype(batch["xd"].dtype)], axis=-1)

        ssl_inputs = {"vp": batch["vp"], "xp": xp, "fill_bit_p": fill_bit_p,
                      "vd": vd, "xd": xd}

        vp = self.protein_extractor(batch["vp"], fill_bit_p, train=train)
        vp = self._site_pool(vp)
        xp = self._site_pool(xp)

        xp = self._encode_prot_llm(xp)
        xd = self._encode_drug_llm(xd)

        cm_inputs = {"prot": vp, "aug_prot": xp, "drug": vd, "aug_drug": xd}

        mv, A_v = self._fuse_v(vp, vd, train=train, need_raw=need_attn)
        mx, A_x = self._fuse_x(xp, xd, train=train, need_raw=need_attn)

        f, attn, guided_attn = self.pmma(mx, mv, train=train)
        score = self._classify(f, train=train)
        return {"score": score, "ssl_inputs": ssl_inputs, "cm_inputs": cm_inputs,
                "A_v_gca": A_v, "A_x_gca": A_x, "attn": attn,
                "guided_attn": guided_attn, "vd": vd, "vp": vp}
