"""Flax ChemBERTa (RoBERTa-style) SMILES encoder.

TPU-native port of the frozen drug encoder (DeepChem/ChemBERTa-77M-MTR) that
the reference runs offline on CPU through HF transformers
(handler/dataset.py:54-57,154-160; it consumes ``last_hidden_state``).
RoBERTa encoder: word + learned-position embeddings (positions offset by
pad_id+1), embedding LayerNorm, N post-LN transformer blocks.

Defaults match the 77M-MTR card (hidden 384, 3 layers, 12 heads,
intermediate 464); the weight converter (encoders/convert.py) adapts to
whatever checkpoint is provided.  Numerics are cross-tested against
transformers' RobertaModel in tests/test_encoders.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ChemBERTaConfig:
    vocab: int = 600
    hidden: int = 384
    num_layers: int = 3
    num_heads: int = 12
    intermediate: int = 464
    max_positions: int = 515
    pad_id: int = 1
    layer_norm_eps: float = 1e-12


class BertSelfAttention(nn.Module):
    cfg: ChemBERTaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        E, H = self.cfg.hidden, self.cfg.num_heads
        D = E // H
        q = nn.Dense(E, dtype=self.dtype, name="query")(x)
        k = nn.Dense(E, dtype=self.dtype, name="key")(x)
        v = nn.Dense(E, dtype=self.dtype, name="value")(x)
        B, L, _ = x.shape
        split = lambda t: t.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhld,bhmd->bhlm", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.float32(D))
        logits = jnp.where(pad_mask[:, None, None, :],
                           jnp.finfo(jnp.float32).min, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        return out.transpose(0, 2, 1, 3).reshape(B, L, E)


class BertLayer(nn.Module):
    cfg: ChemBERTaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        eps = self.cfg.layer_norm_eps
        a = BertSelfAttention(self.cfg, self.dtype, name="attention")(x, pad_mask)
        a = nn.Dense(self.cfg.hidden, dtype=self.dtype, name="attention_output")(a)
        x = nn.LayerNorm(epsilon=eps, name="attention_norm")(x + a)
        h = nn.Dense(self.cfg.intermediate, dtype=self.dtype, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.hidden, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=eps, name="output_norm")(x + h)


class ChemBERTa(nn.Module):
    cfg: ChemBERTaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens (B, L) int32 → last_hidden_state (B, L, hidden)."""
        cfg = self.cfg
        pad_mask = tokens == cfg.pad_id
        # RoBERTa position ids: pad positions keep pad_id, others count from
        # pad_id+1 in order of non-pad appearance
        not_pad = (~pad_mask).astype(jnp.int32)
        positions = jnp.cumsum(not_pad, axis=1) * not_pad + cfg.pad_id

        word = nn.Embed(cfg.vocab, cfg.hidden,
                        embedding_init=nn.initializers.normal(0.02),
                        dtype=self.dtype, name="word_embeddings")(tokens)
        pos = nn.Embed(cfg.max_positions, cfg.hidden,
                       embedding_init=nn.initializers.normal(0.02),
                       dtype=self.dtype, name="position_embeddings")(positions)
        tok_type = self.param("token_type_embedding",
                              nn.initializers.normal(0.02), (cfg.hidden,))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="emb_norm")(x)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, self.dtype, name=f"layer_{i}")(x, pad_mask)
        return x
