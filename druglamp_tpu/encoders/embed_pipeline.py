"""Offline frozen-embedding generation (the reference's ``process()`` path).

Reference handler/dataset.py:124-171 embeds every unique protein (ESM-2,
final-layer representations incl. BOS/EOS rows) and drug (ChemBERTa
last_hidden_state) on CPU, one entity at a time, into per-entity files.
TPU-native version:

- runs the Flax encoders under jit on the accelerator,
- buckets sequences by length into a few fixed padded shapes (static shapes
  → bounded compile count; padded rows are sliced off before writing),
- writes the numpy EmbeddingCache (data/cache.py).

Weights: pass converted params (encoders/convert.py) for real ChemBERTa /
ESM-2 checkpoints; with none given the encoders run random-initialized
(deterministic per seed) — the full pipeline remains runnable in airgapped
environments, with a loud warning since embeddings then carry no pretrained
signal.  For esm2_t48_15B, params can be sharded over the mesh's 'model'
axis before calling (the encoder's Dense kernels carry logical axis names).
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from druglamp_tpu.chem.tokenizer import SmilesTokenizer
from druglamp_tpu.data.cache import EmbeddingCache
from druglamp_tpu.encoders.chemberta import ChemBERTa, ChemBERTaConfig
from druglamp_tpu.encoders.esm2 import (ESM2, ESM_PAD, esm2_config_for_layers,
                                        esm_tokenize)

# Length buckets trade padding waste against compile count.  On hosts where
# compilation is expensive (remote-compile TPU attachments) one bucket is the
# right default — encoder FLOPs at these sizes are trivial next to a compile.
# Set finer buckets (e.g. (128, 256, 512, 1032)) when compiles are cheap.
_BUCKETS = (1032,)        # ESM stage: 1022 residues + BOS/EOS, one program
_DRUG_BUCKETS = (520,)    # ChemBERTa stage: 512 tokens incl. CLS/SEP


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a local encoder checkpoint file into a flat {name: array} dict.

    Accepts .safetensors or a torch-pickled .pt/.pth/.bin (either a bare
    state_dict, an HF save with 'state_dict', or a fair-esm download with
    'model' — reference handler/dataset.py:54-63 loads these same artifacts
    through esm.pretrained/transformers.from_pretrained)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and isinstance(obj.get("model"), dict):
        obj = obj["model"]                      # fair-esm layout
    if isinstance(obj, dict) and isinstance(obj.get("state_dict"), dict):
        obj = obj["state_dict"]                 # lightning/HF layout
    if not isinstance(obj, dict):
        obj = obj.state_dict()                  # a pickled nn.Module
    return obj


def _bucket(n: int, buckets: Optional[Tuple[int, ...]] = None) -> int:
    for b in (_BUCKETS if buckets is None else buckets):
        if n <= b:
            return b
    return n


def _batched(items: List[Tuple[int, np.ndarray]], batch: int, pad_id: int,
             buckets: Optional[Tuple[int, ...]] = None):
    """Group (ordinal, ids) by length bucket, yield padded (ords, tokens).

    The batch dimension is ALWAYS padded to ``batch`` (tail rows replicate
    row 0 and are excluded from ``ords``/``lens``, so consumers never see
    them): a ragged tail chunk would otherwise compile a fresh program per
    (bucket, tail-size) — 10+ cold-compile minutes per new dataset through
    the tunneled runtime.  Encoder rows are batch-independent (LayerNorm
    only), so duplicate pad rows cannot perturb real outputs.

    ``pad_id`` must be the MODEL's pad id: ChemBERTa derives RoBERTa
    position ids by counting non-pad tokens (encoders/chemberta.py), so
    padding with any other id makes pad positions count as real tokens —
    past ``max_positions`` the flax Embed take(mode='fill') fills NaN and
    poisons the whole output (r4 incident: 1621/1621 all-NaN drug caches)."""
    by_bucket: Dict[int, List[Tuple[int, np.ndarray]]] = {}
    for ordn, ids in items:
        by_bucket.setdefault(_bucket(len(ids), buckets), []).append((ordn, ids))
    for b, group in sorted(by_bucket.items()):
        for s in range(0, len(group), batch):
            chunk = group[s : s + batch]
            toks = np.full((batch, b), pad_id, np.int32)
            lens = []
            for r, (_, ids) in enumerate(chunk):
                toks[r, : len(ids)] = ids
                lens.append(len(ids))
            for r in range(len(chunk), batch):      # replicate, don't pad-id
                toks[r] = toks[0]
            yield [o for o, _ in chunk], toks, lens


def generate_embeddings(table, cache: EmbeddingCache, n_layer: int = 30,
                        esm_params=None, chemberta_params=None,
                        chemberta_cfg: Optional[ChemBERTaConfig] = None,
                        tokenizer: Optional[SmilesTokenizer] = None,
                        batch: int = 8, max_prot_resis: int = 1022,
                        max_drug_tokens: int = 512, seed: int = 0,
                        dtype=jnp.float32, mesh=None,
                        esm_ckpt: Optional[str] = None,
                        chemberta_ckpt: Optional[str] = None,
                        chemberta_tokenizer: Optional[str] = None,
                        verbose: bool = True) -> None:
    """Populate ``cache`` with every missing entity embedding in ``table``.

    ``mesh``: optional jax.sharding.Mesh with a 'model' axis — the ESM stack
    is tensor-parallel-sharded over it (required for esm2_t48_15B, which does
    not fit one chip).

    ``esm_ckpt`` / ``chemberta_ckpt``: local checkpoint file paths
    (.pt/.safetensors, HF or fair-esm naming) converted via
    encoders/convert.py — the moment real pretrained weights are on disk,
    one --gen-embed run produces real caches.

    ``chemberta_tokenizer``: directory with the checkpoint's HF tokenizer
    files (vocab.json+merges.txt or tokenizer.json).  REQUIRED with
    ``chemberta_ckpt``: token ids must index that checkpoint's embedding
    rows (reference handler/dataset.py:154-160); the built-in regex
    tokenizer's self-assigned ids would silently produce garbage caches, so
    a real checkpoint without its tokenizer fails loudly."""
    # --- proteins (ESM-2) ---------------------------------------------------
    esm_cfg = esm2_config_for_layers(n_layer)
    esm = ESM2(esm_cfg, dtype=dtype)
    if esm_params is None and esm_ckpt:
        from druglamp_tpu.encoders.convert import esm2_params_from_torch

        if verbose:
            print(f"[embed] loading ESM-2 weights from {esm_ckpt}",
                  file=sys.stderr)
        esm_params = esm2_params_from_torch(
            load_torch_state_dict(esm_ckpt), num_layers=esm_cfg.num_layers)
    if esm_params is None:
        if verbose:
            print("[embed] WARNING: no ESM-2 checkpoint given; using "
                  "random-initialized encoder weights", file=sys.stderr)
        esm_params = esm.init(jax.random.key(seed),
                              jnp.zeros((1, 8), jnp.int32))["params"]
    if mesh is not None:
        from druglamp_tpu.encoders.sharding import shard_encoder_variables

        esm_params = shard_encoder_variables({"params": esm_params}, mesh)["params"]
    esm_apply = jax.jit(lambda p, t: esm.apply({"params": p}, t))

    todo = [(ordn, esm_tokenize(seq, max_prot_resis))
            for seq, ordn in table.prot2ord.items() if not cache.has_prot(ordn)]
    n_done = 0
    for ords, toks, lens in _batched(todo, batch, ESM_PAD):
        reps = np.asarray(esm_apply(esm_params, jnp.asarray(toks)), np.float32)
        if not np.isfinite(reps).all():
            raise RuntimeError(
                f"non-finite ESM embeddings for ordinals {ords} — refusing "
                "to write a poisoned cache")
        for r, (ordn, ln) in enumerate(zip(ords, lens)):
            cache.put_prot(ordn, reps[r, :ln])
        n_done += len(ords)
        if verbose and n_done % 64 == 0:
            print(f"[embed] proteins {n_done}/{len(todo)}", file=sys.stderr)

    # --- drugs (ChemBERTa) --------------------------------------------------
    cb_cfg = chemberta_cfg or ChemBERTaConfig(hidden=cache.n_drug_feature)
    # real (non-random-init) weights can arrive two ways — a ckpt path OR
    # pre-loaded params from the caller; BOTH must pass the tokenizer
    # alignment guard (advisor r4: the ckpt-branch-only gate let pre-loaded
    # params + the default regex tokenizer write silent-garbage caches)
    cb_params_provided = chemberta_params is not None or bool(chemberta_ckpt)
    if tokenizer is None:
        if chemberta_tokenizer:
            # real checkpoints need their OWN tokenizer: ids must index the
            # checkpoint's embedding rows (reference handler/dataset.py:154-160)
            from druglamp_tpu.chem.hf_tokenizer import HFTokenizer

            tokenizer = HFTokenizer(chemberta_tokenizer)
        else:
            tokenizer = SmilesTokenizer()
            tokenizer.extend_from_corpus(table.drug2ord.keys())
    if tokenizer.vocab_size > cb_cfg.vocab:
        cb_cfg = ChemBERTaConfig(**{**cb_cfg.__dict__, "vocab": tokenizer.vocab_size})
    from druglamp_tpu.chem.hf_tokenizer import HFTokenizer

    if getattr(tokenizer, "pad_id", cb_cfg.pad_id) != cb_cfg.pad_id \
            and isinstance(tokenizer, HFTokenizer):
        # a checkpoint tokenizer defines the model's pad id (RoBERTa: 1);
        # the model derives position ids from it, so they must agree.
        # Keyed on the tokenizer OBJECT, not the --chemberta-tokenizer path
        # arg, so a caller-constructed HFTokenizer aligns too (advisor r4);
        # the built-in regex tokenizer keeps cb_cfg's pad id (its random-init
        # caches are reproducible artifacts keyed on that choice).
        cb_cfg = ChemBERTaConfig(**{**cb_cfg.__dict__,
                                    "pad_id": tokenizer.pad_id})
    cb = ChemBERTa(cb_cfg, dtype=dtype)
    if chemberta_params is None and chemberta_ckpt:
        from druglamp_tpu.encoders.convert import chemberta_params_from_torch

        if verbose:
            print(f"[embed] loading ChemBERTa weights from {chemberta_ckpt}",
                  file=sys.stderr)
        chemberta_params = chemberta_params_from_torch(
            load_torch_state_dict(chemberta_ckpt), num_layers=cb_cfg.num_layers)
    if chemberta_params is None:
        if verbose:
            print("[embed] WARNING: no ChemBERTa checkpoint given; using "
                  "random-initialized encoder weights", file=sys.stderr)
        chemberta_params = cb.init(jax.random.key(seed + 1),
                                   jnp.ones((1, 8), jnp.int32))["params"]
    if cb_params_provided:
        # real weights (ckpt path OR pre-loaded params): ids must index the
        # checkpoint's embedding rows
        from druglamp_tpu.chem.hf_tokenizer import check_vocab_alignment

        check_vocab_alignment(tokenizer, chemberta_params)
    cb_apply = jax.jit(lambda p, t: cb.apply({"params": p}, t))

    todo_d = [(ordn, np.asarray(tokenizer.encode(smi, max_length=max_drug_tokens),
                                np.int32))
              for smi, ordn in table.drug2ord.items() if not cache.has_drug(ordn)]
    n_done = 0
    # pad with the MODEL's pad id (see _batched docstring; the tokenizer's
    # own pad id is aligned into cb_cfg above when a real tokenizer is used)
    for ords, toks, lens in _batched(todo_d, batch, cb_cfg.pad_id,
                                     buckets=_DRUG_BUCKETS):
        reps = np.asarray(cb_apply(chemberta_params, jnp.asarray(toks)), np.float32)
        if not np.isfinite(reps).all():
            raise RuntimeError(
                f"non-finite ChemBERTa embeddings for ordinals {ords} — "
                "refusing to write a poisoned cache")
        for r, (ordn, ln) in enumerate(zip(ords, lens)):
            cache.put_drug(ordn, reps[r, :ln])
        n_done += len(ords)
        if verbose and n_done % 256 == 0:
            print(f"[embed] drugs {n_done}/{len(todo_d)}", file=sys.stderr)
