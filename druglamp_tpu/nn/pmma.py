"""PMMA — paired multimodal attention encoder.

Reference: model/PMMA/{paired_multi_model_attention_model,encoder,block,
attention,embed,mlp}.py.  Structure:

- Embeddings: learned positional embeddings pe_prot/pe_mol (1, 256, 256) added
  to the two streams + dropout 0.1.  NOTE (replicated reference behaviour,
  embed.py:50-51): the prot stream's Linear output is computed and *discarded*
  — ``embeddings = prot + pe_prot`` — so that Linear receives no gradient and
  is functionally absent; we omit it.  The mol stream's Linear IS applied.
- Blocks 0–1 (mm=True): two-stream paired attention.  Per stream s with the
  other stream o:  self-term softmax(Q_s K_sᵀ/√d)V_s  and  guided-term
  softmax(Q_o K_sᵀ/√d)V_s, concatenated on features → fc(2E→E) → out(E→E),
  each stream with its own pre-LN and 4× GELU MLP (block.py:45-62).
- Block 2: streams concatenated on features (256→512); blocks 2–3 are plain
  4-head self-attention at width 512 (the reference mutates config.hidden_size
  in place, encoder.py:36-37 — here the widening is explicit).
- Final LayerNorm(512, eps=1e-6).

The paired attention core runs through kernels/paired_attention.py which
dispatches to a fused Pallas TPU kernel (both attention products share one
K/V load and never materialize probabilities in HBM) with a jnp fallback.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from druglamp_tpu.nn import inits
from druglamp_tpu.nn.layers import TorchDense
from druglamp_tpu.kernels.paired_attention import paired_attention_core, self_attention_core


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """4× GELU MLP (reference PMMA/mlp.py): xavier weights, N(0,1e-6) bias."""

    hidden_size: int
    dropout_rate: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_size * 4, kernel_init=inits.xavier_uniform,
                     bias_init=inits.tiny_normal(), dtype=self.dtype, name="fc1")(x)
        x = _gelu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.hidden_size, kernel_init=inits.xavier_uniform,
                     bias_init=inits.tiny_normal(), dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


def _split_heads(x, num_heads):
    B, L, E = x.shape
    return x.reshape(B, L, num_heads, E // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)


class PairedAttention(nn.Module):
    """Two-stream paired attention (reference PMMA/attention.py:90-127)."""

    hidden_size: int
    num_heads: int = 4
    vis: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, prot, mol):
        H = self.num_heads
        dense = lambda name: TorchDense(self.hidden_size, dtype=self.dtype, name=name)
        q_p = _split_heads(dense("query")(prot), H)
        k_p = _split_heads(dense("key")(prot), H)
        v_p = _split_heads(dense("value")(prot), H)
        q_m = _split_heads(dense("query_mol")(mol), H)
        k_m = _split_heads(dense("key_mol")(mol), H)
        v_m = _split_heads(dense("value_mol")(mol), H)

        # prot stream: self(q_p against prot K/V) + guided(q_m against prot K/V)
        self_p, guided_p, w_p, gw_p = paired_attention_core(q_p, k_p, v_p, q_m,
                                                            need_weights=self.vis)
        attn_prot = jnp.concatenate([_merge_heads(self_p), _merge_heads(guided_p)], axis=-1)
        attn_prot = TorchDense(self.hidden_size, dtype=self.dtype, name="fc")(attn_prot)
        attn_prot = TorchDense(self.hidden_size, dtype=self.dtype, name="out")(attn_prot)

        # mol stream: self(q_m against mol K/V) + guided(q_p against mol K/V)
        self_m, guided_m, _, _ = paired_attention_core(q_m, k_m, v_m, q_p,
                                                       need_weights=False)
        attn_mol = jnp.concatenate([_merge_heads(self_m), _merge_heads(guided_m)], axis=-1)
        attn_mol = TorchDense(self.hidden_size, dtype=self.dtype, name="fc_mol")(attn_mol)
        attn_mol = TorchDense(self.hidden_size, dtype=self.dtype, name="out_mol")(attn_mol)
        return attn_prot, attn_mol, w_p, gw_p


class SelfAttention(nn.Module):
    """Plain multi-head self-attention (reference PMMA/attention.py:129-160)."""

    hidden_size: int
    num_heads: int = 4
    vis: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        H = self.num_heads
        dense = lambda name: TorchDense(self.hidden_size, dtype=self.dtype, name=name)
        q = _split_heads(dense("query")(x), H)
        k = _split_heads(dense("key")(x), H)
        v = _split_heads(dense("value")(x), H)
        out, w = self_attention_core(q, k, v, need_weights=self.vis)
        out = TorchDense(self.hidden_size, dtype=self.dtype, name="out")(_merge_heads(out))
        return out, w


class PMMABlock(nn.Module):
    hidden_size: int
    num_heads: int = 4
    mm: bool = False
    dropout_rate: float = 0.1
    vis: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, prot, mol=None, train: bool = False):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, name=name)
        if not self.mm:
            h = prot
            x, w = SelfAttention(self.hidden_size, self.num_heads, self.vis,
                                 dtype=self.dtype, name="attn")(
                ln("attention_norm")(prot))
            x = x + h
            h = x
            y = Mlp(self.hidden_size, self.dropout_rate, dtype=self.dtype,
                    name="ffn")(ln("ffn_norm")(x), train=train)
            return y + h, None, w, None

        h_p, h_m = prot, mol
        p_in = ln("attention_norm")(prot)
        m_in = ln("att_norm_mol")(mol)
        p, m, w, gw = PairedAttention(self.hidden_size, self.num_heads, self.vis,
                                      dtype=self.dtype, name="attn")(p_in, m_in)
        p, m = p + h_p, m + h_m
        h_p, h_m = p, m
        p = Mlp(self.hidden_size, self.dropout_rate, dtype=self.dtype,
                name="ffn")(ln("ffn_norm")(p), train=train) + h_p
        m = Mlp(self.hidden_size, self.dropout_rate, dtype=self.dtype,
                name="ffn_mol")(ln("ffn_norm_mol")(m), train=train) + h_m
        return p, m, w, gw


class PairedMultimodalAttention(nn.Module):
    """Full PMMA stack: embeddings + 4 blocks + final norm.

    ``hidden_size`` is the per-stream width (2 × n_hidden = 256); the output
    width is 2 × hidden_size after the block-2 concat.
    """

    hidden_size: int = 256
    num_heads: int = 4
    num_layers: int = 4
    feat_len: int = 256
    mol_len: int = 256
    dropout_rate: float = 0.1
    vis: bool = False
    dtype: Any = None
    variant: str = "pmma"   # 'pmma' | 'linattn' (reference LinAttnEncoder,
                            # encoder.py:58-86: blocks ≥2 are MHLA + residual)

    @nn.compact
    def __call__(self, prot, mol, train: bool = False):
        from druglamp_tpu.nn.mhla import MultiHeadLinearAttention

        E = self.hidden_size
        pe_prot = self.param("pe_prot", inits.zeros, (1, self.feat_len, E))
        pe_mol = self.param("pe_mol", inits.zeros, (1, self.mol_len, E))

        mol = TorchDense(E, dtype=self.dtype, name="mol_embeddings")(mol) + pe_mol
        mol = nn.Dropout(self.dropout_rate, deterministic=not train)(mol)
        prot = prot + pe_prot  # prot Linear discarded in reference (embed.py:50-51)
        prot = nn.Dropout(self.dropout_rate, deterministic=not train)(prot)

        weights, guided_weights = [], []
        x = prot
        for i in range(self.num_layers):
            if i < 2:
                x, mol, w, gw = PMMABlock(E, self.num_heads, mm=True,
                                          dropout_rate=self.dropout_rate,
                                          vis=self.vis, dtype=self.dtype,
                                          name=f"block_{i}")(
                    x, mol, train=train)
            else:
                if i == 2:
                    x = jnp.concatenate([x, mol], axis=-1)
                if self.variant == "linattn":
                    h = x
                    x = MultiHeadLinearAttention(
                        d_model=2 * E, d_diff=8 * E, nhead=8,
                        dropout=self.dropout_rate, activation="gelu",
                        dtype=self.dtype, name=f"block_{i}")(x, train=train)
                    x = x + h
                    w = gw = None
                else:
                    x, _, w, gw = PMMABlock(2 * E, self.num_heads, mm=False,
                                            dropout_rate=self.dropout_rate,
                                            vis=self.vis, dtype=self.dtype,
                                            name=f"block_{i}")(
                        x, train=train)
            if self.vis:
                weights.append(w)
                guided_weights.append(gw)
        x = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(x)
        return x, weights, guided_weights
