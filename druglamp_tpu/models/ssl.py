"""Self-supervised auxiliary objectives (reference model/self_supervised_learning.py).

- Protein MLM: mask 15% of non-pad tokens (replace-prob 0.9, mask id 26),
  re-encode through the *shared* ProteinCNN, project to 27 logits; the LLM
  branch projects the frozen ESM embeddings directly.  Modes 'double' | 'vp'
  | 'xp' select which branches contribute (:67-101).
- Drug SimSiam: per-token projections of GCN tokens vs ChemBERTa tokens
  through SimSiam MLPs, predictor head, stop-gradient targets, negative
  cosine ×2 (:43-65).  NT-Xent SimCLR alternative (:35-41, :168-182).

The reference builds the SimSiam projectors lazily on first forward
(``@singleton``, :126-142); dims are static here (vd: n_hidden,
xd: n_drug_feature+1), so they are built eagerly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.losses.masking import mlm_mask
from druglamp_tpu.nn.layers import TorchBatchNorm, TorchDense
from druglamp_tpu.nn.protein_cnn import ProteinCNN


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class SimSiamMLP(nn.Module):
    """dim → hidden(BN,ReLU) → hidden(BN,ReLU) → out(BN, no affine); no biases."""

    proj_out: int
    hidden_size: int = 512
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchDense(self.hidden_size, use_bias=False, name="l1")(x)
        x = nn.relu(TorchBatchNorm(name="bn1", groups=self.bn_groups)(
            x, use_running_average=not train))
        x = TorchDense(self.hidden_size, use_bias=False, name="l2")(x)
        x = nn.relu(TorchBatchNorm(name="bn2", groups=self.bn_groups)(
            x, use_running_average=not train))
        x = TorchDense(self.proj_out, use_bias=False, name="l3")(x)
        return TorchBatchNorm(affine=False, name="bn3", groups=self.bn_groups)(
            x, use_running_average=not train)


class PredictorMLP(nn.Module):
    proj_out: int
    hidden_size: int
    bn_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchDense(self.hidden_size, name="l1")(x)
        x = nn.relu(TorchBatchNorm(name="bn", groups=self.bn_groups)(
            x, use_running_average=not train))
        return TorchDense(self.proj_out, name="l2")(x)


def negcos_loss(x, y):
    """2 - 2·cos(x, y) per row (reference :184-187)."""
    return 2.0 - 2.0 * (_l2norm(x) * _l2norm(y)).sum(axis=-1)


def nt_xent_loss(queries, keys, temperature=0.1):
    """SimCLR NT-Xent (reference :168-182)."""
    b = queries.shape[0]
    n = 2 * b
    projs = jnp.concatenate([queries, keys], axis=0)
    logits = projs @ projs.T
    mask = jnp.eye(n, dtype=bool)
    logits = jnp.where(mask, -jnp.inf, logits) / temperature
    labels = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=1).sum()
    return loss / n


class SSL(nn.Module):
    """Auxiliary SSL heads; the protein extractor is shared by reference."""

    prot_extractor: ProteinCNN
    n_prot_feature: int
    drug_ssl_type: str = "simsiam"
    n_hidden: int = 128
    bn_groups: int = 1

    def setup(self):
        self.to_logits = TorchDense(27)
        self.llm_to_logits = TorchDense(27)
        self.net = SimSiamMLP(self.n_hidden, bn_groups=self.bn_groups)
        self.llm_net = SimSiamMLP(self.n_hidden, bn_groups=self.bn_groups)
        if self.drug_ssl_type == "simsiam":
            self.predictor = PredictorMLP(self.n_hidden, self.n_hidden * 4,
                                          bn_groups=self.bn_groups)
        self.temperature = 0.1

    def prot_mlm(self, seq, xp, fill_bit, mode: str, rng, train: bool = True):
        masked_seq, labels, _ = mlm_mask(seq, rng)
        losses = []
        if mode != "xp":
            embedding = self.prot_extractor(masked_seq, fill_bit, train=train)
            logits = self.to_logits(embedding)
            losses.append(_masked_ce(logits, labels))
        if mode != "vp":
            llm_logits = self.llm_to_logits(xp)
            losses.append(_masked_ce(llm_logits, labels))
        return sum(losses) / len(losses)

    def drug_simsiam(self, vd, xd, train: bool = True):
        drug_one = vd.reshape(-1, vd.shape[-1])
        drug_two = xd.reshape(-1, xd.shape[-1])
        proj_one = self.net(drug_one, train=train)
        proj_two = self.llm_net(drug_two, train=train)
        pred_one = self.predictor(proj_one, train=train)
        pred_two = self.predictor(proj_two, train=train)
        # stop-gradient targets; the torch no_grad re-forward produces
        # identical values, so reuse the projections (:53-61)
        t_one = jax.lax.stop_gradient(proj_one)
        t_two = jax.lax.stop_gradient(proj_two)
        loss = negcos_loss(pred_one, t_two) + negcos_loss(pred_two, t_one)
        return loss.mean()

    def drug_simclr(self, vd, xd, train: bool = True):
        queries = self.net(vd.reshape(-1, vd.shape[-1]), train=train)
        keys = self.llm_net(xd.reshape(-1, xd.shape[-1]), train=train)
        return nt_xent_loss(queries.reshape(queries.shape[0], -1),
                            keys.reshape(keys.shape[0], -1), self.temperature)

    def __call__(self, vp, xp, fill_bit_p, vd, xd, rng, p_mode: str = "double",
                 train: bool = True):
        prot_ssl = self.prot_mlm(vp, xp, fill_bit_p, p_mode, rng, train=train)
        if vd is None or xd is None:
            drug_ssl = jnp.float32(0.0)
        elif self.drug_ssl_type == "simsiam":
            drug_ssl = self.drug_simsiam(vd, xd, train=train)
        else:
            drug_ssl = self.drug_simclr(vd, xd, train=train)
        return {"prot_ssl": prot_ssl, "drug_ssl": drug_ssl}


def _masked_ce(logits, labels, ignore_index: int = 0):
    """CE over (B, L, V) with mean over labels != ignore_index."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    valid = (labels != ignore_index).astype(jnp.float32)
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1.0)
