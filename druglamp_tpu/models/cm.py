"""Cross-modality margin-scheduled triplet loss (reference model/cross_modality.py).

The reference's triplet miner is data-dependent Python over batch metadata
(:15-47): for each unique protein, every (positive drug, negative drug) pair
forms a triplet (anchor=protein); proteins with negatives but no positives
fall back to anchor=positive=protein triplets.  Here it is a masked dense
computation over a (B × B) ground-truth matrix so the whole loss jits:

  host supplies  p_index/d_index (B,) — batch row of each unique entity slot,
                 p_valid/d_valid (B,) — slot validity,
                 gt (B, B) — interaction label per (prot slot, drug slot),
                 0 for unobserved pairs (reference default_cell, :141)

  loss = Σᵢ Σ_{j⁺,j⁻} relu(D[i,j⁺] − D[i,j⁻] + margin)        (has positives)
       + Σᵢ Σ_{j⁻}    relu(D_pp[i] − D[i,j⁻] + margin)         (fallback)
  normalized by the triplet count (min 1), with
  D[i,j] = 1 − sigmoid(cos(p_i, d_j))  (sigmoid_cosine_distance_p, p=1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.nn.layers import MaskedBatchNorm, TorchDense


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class Mean2Embed(nn.Module):
    """BatchNorm → ReLU → Linear over pooled embeddings (reference :166-171)."""

    hidden: int = 128
    groups: int = 1

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        x = MaskedBatchNorm(name="bn", groups=self.groups)(
            x, valid, use_running_average=not train)
        x = nn.relu(x)
        return TorchDense(self.hidden, name="lin")(x)


class CrossModality(nn.Module):
    """``groups > 1`` = per-replica mining (torch-DDP emulation): each
    contiguous batch block of B/groups samples mines its own triplets over
    per-block gt arrays, each block's loss normalized by its own n_tri, and
    the result is the mean over blocks — exactly the loss whose gradient the
    reference's DDP grad-averaging computes (trainer.py:147).  Default
    (groups=1) mines over the global batch."""

    hidden_size: int = 128
    groups: int = 1

    def setup(self):
        self.prot2latent = Mean2Embed(self.hidden_size, groups=self.groups)
        self.aug_prot2latent = Mean2Embed(self.hidden_size, groups=self.groups)
        self.drug2latent = Mean2Embed(self.hidden_size, groups=self.groups)
        self.aug_drug2latent = Mean2Embed(self.hidden_size, groups=self.groups)
        self.to_prot_latent = TorchDense(self.hidden_size * 2, use_bias=False)
        self.to_drug_latent = TorchDense(self.hidden_size * 2, use_bias=False)

    def __call__(self, prot, aug_prot, drug, aug_drug,
                 p_index, p_valid, d_index, d_valid, gt,
                 margin, train: bool = True):
        g = self.groups
        if g > 1:
            # per-block row indices are block-local: offset into the flat batch
            B = prot.shape[0]
            off = (jnp.arange(g) * (B // g))[:, None]             # (g, 1)
            p_index = (p_index + off).reshape(-1)
            d_index = (d_index + off).reshape(-1)
            p_valid = p_valid.reshape(-1)
            d_valid = d_valid.reshape(-1)

        # select the unique-entity representative rows (fixed shape B)
        prot = jnp.take(prot, p_index, axis=0)
        aug_prot = jnp.take(aug_prot, p_index, axis=0)
        drug = jnp.take(drug, d_index, axis=0)
        aug_drug = jnp.take(aug_drug, d_index, axis=0)

        p = self.prot2latent(prot.mean(axis=1), p_valid, train=train)
        ap = self.aug_prot2latent(aug_prot.mean(axis=1), p_valid, train=train)
        d = self.drug2latent(drug.mean(axis=1), d_valid, train=train)
        ad = self.aug_drug2latent(aug_drug.mean(axis=1), d_valid, train=train)

        p_lats = _l2norm(self.to_prot_latent(jnp.concatenate([p, ap], axis=-1)))
        d_lats = _l2norm(self.to_drug_latent(jnp.concatenate([d, ad], axis=-1)))

        if g > 1:
            n = p_lats.shape[0] // g
            losses = jax.vmap(triplet_loss, in_axes=(0, 0, 0, 0, 0, None))(
                p_lats.reshape(g, n, -1), d_lats.reshape(g, n, -1),
                p_valid.reshape(g, n), d_valid.reshape(g, n), gt, margin)
            return losses.mean()
        return triplet_loss(p_lats, d_lats, p_valid, d_valid, gt, margin)


def triplet_loss(p_lats, d_lats, p_valid, d_valid, gt, margin):
    """Masked dense ccpp_p_tri_loss (reference :15-47)."""
    pv = p_valid.astype(jnp.float32)
    dv = d_valid.astype(jnp.float32)

    cos_pd = jnp.einsum("ic,jc->ij", p_lats, d_lats)          # (P, D)
    dist = 1.0 - jax.nn.sigmoid(cos_pd)                        # sigmoid cosine distance
    self_cos = (p_lats * p_lats).sum(axis=-1)                  # ≈ 1 for valid rows
    dist_pp = 1.0 - jax.nn.sigmoid(self_cos)                   # (P,)

    pos = (gt == 1) & d_valid[None, :]
    neg = (gt == 0) & d_valid[None, :]
    posf = pos.astype(jnp.float32)
    negf = neg.astype(jnp.float32)
    n_pos = posf.sum(axis=1)
    n_neg = negf.sum(axis=1)
    has_pos = (n_pos > 0) & p_valid
    has_neg = (n_neg > 0) & p_valid

    # anchor=prot, positive/negative=drugs: relu(D⁺ - D⁻ + m) over pos × neg
    viol = nn.relu(dist[:, :, None] - dist[:, None, :] + margin)  # (P, D⁺, D⁻)
    pair_mask = posf[:, :, None] * negf[:, None, :]
    term_pairs = (viol * pair_mask).sum(axis=(1, 2)) * has_pos.astype(jnp.float32)

    # fallback: anchor=positive=prot vs each negative drug
    viol_fb = nn.relu(dist_pp[:, None] - dist + margin)           # (P, D)
    fb_mask = (has_neg & ~has_pos).astype(jnp.float32)
    term_fb = (viol_fb * negf).sum(axis=1) * fb_mask

    n_tri = (n_pos * n_neg * has_pos).sum() + (n_neg * fb_mask).sum()
    n_tri = jnp.maximum(n_tri, 1.0)
    return (term_pairs.sum() + term_fb.sum()) / n_tri
