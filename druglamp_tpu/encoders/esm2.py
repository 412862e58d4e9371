"""Flax ESM-2 protein language model.

TPU-native port of the frozen encoder the reference runs offline on CPU via
fair-esm (handler/dataset.py:54-63,138-147; variant table main.py:12-18).
Architecture (public ESM-2): token embedding → N pre-LN transformer blocks
with rotary position embeddings on Q/K → final LayerNorm; the reference
consumes ``representations[n_layer]`` (the post-final-LN hidden states when
n_layer == num_layers), so the MLM/contact heads are not required for cache
generation and are omitted (``return_contacts=True`` in the reference is
vestigial — the contacts are never used; peptide-chain edges come from
``edges_from_protein_sequence``).

Sizes: t12-35M (480d), t30-150M (640d, default), t33-650M (1280d),
t36-3B (2560d), t48-15B (5120d).  The 15B variant does not fit one chip:
every Dense kernel takes a logical sharding axis name so the encoder can be
pjit-sharded over the mesh's 'model' axis (SURVEY §2, parallelism note).

Weights convert from HF/fair-esm checkpoints via encoders/convert.py;
numerics are cross-tested against transformers' EsmModel in
tests/test_encoders.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# fair-esm alphabet (standard ordering; prepend <cls>, append <eos>)
ESM_ALPHABET = [
    "<cls>", "<pad>", "<eos>", "<unk>", "L", "A", "G", "V", "S", "E", "R", "T",
    "I", "D", "P", "K", "Q", "N", "F", "Y", "M", "H", "W", "C", "X", "B", "U",
    "Z", "O", ".", "-", "<null_1>", "<mask>",
]
ESM_TOK2IDX = {t: i for i, t in enumerate(ESM_ALPHABET)}
ESM_CLS, ESM_PAD, ESM_EOS, ESM_UNK, ESM_MASK = 0, 1, 2, 3, 32


def esm_tokenize(seq: str, max_len: Optional[int] = None) -> np.ndarray:
    """<cls> + residues + <eos> (reference truncates to 1022 residues first)."""
    if max_len is not None:
        seq = seq[:max_len]
    ids = [ESM_CLS] + [ESM_TOK2IDX.get(c.upper(), ESM_UNK) for c in seq] + [ESM_EOS]
    return np.array(ids, dtype=np.int32)


@dataclass(frozen=True)
class ESM2Config:
    num_layers: int = 30
    embed_dim: int = 640
    num_heads: int = 20
    vocab: int = 33
    ffn_dim: Optional[int] = None
    layer_norm_eps: float = 1e-5   # fair-esm / HF esm2 checkpoints use 1e-5

    @property
    def ffn(self) -> int:
        return self.ffn_dim or 4 * self.embed_dim


_ESM2_SIZES = {
    12: ESM2Config(12, 480, 20),
    30: ESM2Config(30, 640, 20),
    33: ESM2Config(33, 1280, 20),
    36: ESM2Config(36, 2560, 40),
    48: ESM2Config(48, 5120, 40),
}


def esm2_config_for_layers(n_layer: int) -> ESM2Config:
    return _ESM2_SIZES[n_layer]


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(q, k, positions):
    """ESM-2 rotary embeddings over the full head dim (theta 10000)."""
    dim = q.shape[-1]
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions[:, None].astype(jnp.float32) * inv_freq[None, :]   # (L, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)                        # (L, dim)
    cos = jnp.cos(emb)[None, None, :, :]
    sin = jnp.sin(emb)[None, None, :, :]
    q2 = (q * cos) + (_rotate_half(q) * sin)
    k2 = (k * cos) + (_rotate_half(k) * sin)
    return q2.astype(q.dtype), k2.astype(k.dtype)


class ESMSelfAttention(nn.Module):
    cfg: ESM2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        E, H = self.cfg.embed_dim, self.cfg.num_heads
        D = E // H
        dense = lambda name: nn.Dense(
            E, dtype=self.dtype, name=name,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed", "model_heads")))
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        B, L, _ = x.shape
        split = lambda t: t.reshape(B, L, H, D).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        q, k = apply_rotary(q, k, jnp.arange(L))

        logits = jnp.einsum("bhld,bhmd->bhlm", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.float32(D))
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(pad_mask[:, None, None, :], neg, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
        out = nn.Dense(E, dtype=self.dtype, name="out_proj",
                       kernel_init=nn.with_logical_partitioning(
                           nn.initializers.xavier_uniform(),
                           ("model_heads", "embed")))(out)
        return out


class ESMLayer(nn.Module):
    cfg: ESM2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask):
        h = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="self_attn_layer_norm")(x)
        x = x + ESMSelfAttention(self.cfg, self.dtype, name="self_attn")(h, pad_mask)
        h = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="final_layer_norm")(x)
        h = nn.Dense(self.cfg.ffn, dtype=self.dtype, name="fc1",
                     kernel_init=nn.with_logical_partitioning(
                         nn.initializers.xavier_uniform(), ("embed", "model_ffn")))(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.embed_dim, dtype=self.dtype, name="fc2",
                     kernel_init=nn.with_logical_partitioning(
                         nn.initializers.xavier_uniform(), ("model_ffn", "embed")))(h)
        return x + h


class ESM2(nn.Module):
    cfg: ESM2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens (B, L) int32 → final-layer representations (B, L, E).

        Matches fair-esm ``results['representations'][num_layers]`` (the
        hidden state after the last block + emb_layer_norm_after).
        Padding (<pad>=1) is masked out of attention; padded outputs are
        whatever the stack produces there and must be sliced off by callers
        (as fair-esm's are).
        """
        pad_mask = tokens == ESM_PAD
        emb = nn.Embed(self.cfg.vocab, self.cfg.embed_dim,
                       embedding_init=nn.initializers.normal(stddev=0.02),
                       dtype=self.dtype, name="embed_tokens")(tokens)
        x = jnp.where(pad_mask[..., None], 0.0, emb)
        # ESM-2 token-dropout inference rescale: masked-token embeddings are
        # zeroed and the rest scaled by (1−0.12)/(1−observed mask ratio)
        # (0.88 when no <mask> tokens are present, the cache-generation case).
        mask_tok = tokens == ESM_MASK
        x = jnp.where(mask_tok[..., None], 0.0, x)
        src_len = jnp.maximum((~pad_mask).sum(axis=-1), 1)
        mask_ratio_obs = mask_tok.sum(axis=-1).astype(jnp.float32) / src_len
        x = x * ((1.0 - 0.12) / (1.0 - mask_ratio_obs))[:, None, None]
        for i in range(self.cfg.num_layers):
            x = ESMLayer(self.cfg, self.dtype, name=f"layer_{i}")(x, pad_mask)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="emb_layer_norm_after")(x)
        return x
