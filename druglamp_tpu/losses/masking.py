"""MLM mask sampling — faithful port of the reference's exact-count algorithm.

Reference utils.py:532-555: ``get_mask_subset_with_prob`` draws exactly
ceil(prob·seq_len) top-k candidates from uniform noise restricted to
maskable positions, then cancels the excess beyond ceil(n_maskable·prob)
per row via the cumulative-sum trick; ``prob_mask_like`` is iid Bernoulli.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def mask_with_tokens(t: jnp.ndarray, token_ids: Sequence[int]) -> jnp.ndarray:
    mask = jnp.zeros_like(t, dtype=bool)
    for tid in token_ids:
        mask = mask | (t == tid)
    return mask


def get_mask_subset_with_prob(mask: jnp.ndarray, prob: float, rng: jax.Array) -> jnp.ndarray:
    """mask (B, L) bool of maskable positions → (B, L) bool subset."""
    B, L = mask.shape
    max_masked = math.ceil(prob * L)

    num_tokens = mask.sum(axis=-1, keepdims=True)
    mask_excess = jnp.cumsum(mask.astype(jnp.int32), axis=-1) > jnp.ceil(num_tokens * prob)
    mask_excess = mask_excess[:, :max_masked]

    rand = jax.random.uniform(rng, (B, L))
    rand = jnp.where(mask, rand, -1e9)
    _, sampled_indices = jax.lax.top_k(rand, max_masked)
    sampled_indices = jnp.where(mask_excess, 0, sampled_indices + 1)

    new_mask = jnp.zeros((B, L + 1), dtype=jnp.int32)
    new_mask = new_mask.at[jnp.arange(B)[:, None], sampled_indices].set(1)
    return new_mask[:, 1:].astype(bool)


def prob_mask_like(shape, prob: float, rng: jax.Array) -> jnp.ndarray:
    return jax.random.uniform(rng, shape) < prob


def mlm_mask(
    seq: jnp.ndarray,
    rng: jax.Array,
    mask_prob: float = 0.15,
    replace_prob: float = 0.9,
    mask_ignore_token_ids: Sequence[int] = (0,),
    pad_token_id: int = 0,
    mask_token_id: int = 26,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (masked_seq, labels, mask) for protein MLM.

    labels hold the true token at masked positions and pad_token_id elsewhere
    (the CE loss ignores pad), matching SSL.prot_mlm
    (reference model/self_supervised_learning.py:67-83).
    """
    r_subset, r_replace = jax.random.split(rng)
    no_mask = mask_with_tokens(seq, mask_ignore_token_ids)
    mask = get_mask_subset_with_prob(~no_mask, mask_prob, r_subset)
    labels = jnp.where(mask, seq, pad_token_id)
    replace = prob_mask_like(seq.shape, replace_prob, r_replace)
    masked_seq = jnp.where(mask & replace, mask_token_id, seq)
    return masked_seq, labels, mask
