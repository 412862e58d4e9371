"""HF-tokenizer adapter for real ChemBERTa checkpoints.

The reference tokenizes SMILES with the checkpoint's own HF BPE tokenizer
(reference handler/dataset.py:154-160, utils.py:119-183); the first-party
regex tokenizer (chem/tokenizer.py) has its OWN vocabulary, so with real
pretrained weights its ids would index the wrong embedding rows — silently
garbage caches.  This adapter wraps the checkpoint's tokenizer files
(vocab.json + merges.txt, or tokenizer.json) behind the same interface the
embedding pipeline consumes (encode / tokenize_with_spans / vocab_size /
pad_id), so ``--gen-embed --chemberta-ckpt ... --chemberta-tokenizer <dir>``
produces caches whose token ids match the checkpoint's embedding matrix.

Id fidelity is delegated to ``transformers`` (baked into the container;
loaded with local_files_only so no egress is ever attempted) and asserted
in tests/test_encoders.py against the raw tokenizer output.
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class HFTokenizer:
    """SmilesTokenizer-interface wrapper over a local HF tokenizer dir."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.path = path
        self.pad_id = self._require("pad_token_id")
        self.cls_id = self._require("cls_token_id")
        self.sep_id = self._require("sep_token_id")
        self.mask_id = getattr(self._tok, "mask_token_id", None)

    def _require(self, attr: str) -> int:
        v = getattr(self._tok, attr, None)
        if v is None:
            raise ValueError(
                f"tokenizer at {self.path} has no {attr}; a ChemBERTa "
                "(RoBERTa-style) tokenizer is required")
        return int(v)

    @property
    def vocab_size(self) -> int:
        # len() includes added special tokens; .vocab_size alone may not
        return len(self._tok)

    def extend_from_corpus(self, smiles_iter) -> None:
        """No-op: a pretrained vocabulary is FIXED — extending it would
        desynchronize ids from the checkpoint's embedding rows."""

    def tokenize(self, smiles: str) -> List[str]:
        return self._tok.tokenize(smiles)

    def tokenize_with_spans(self, smiles: str) -> List[Tuple[str, int, int]]:
        """Surface tokens with char spans (for SMILES-token↔atom-graph edge
        remapping, reference utils.py:119-183).  Requires a fast tokenizer
        (offsets come from the Rust backend)."""
        enc = self._tok(smiles, return_offsets_mapping=True,
                        add_special_tokens=False)
        toks = self._tok.convert_ids_to_tokens(enc["input_ids"])
        return [(t, int(a), int(b))
                for t, (a, b) in zip(toks, enc["offset_mapping"])]

    def encode(self, smiles: str, max_length: Optional[int] = None) -> List[int]:
        """CLS + tokens + SEP ids, truncated like HF ``encode``."""
        if max_length is not None:
            return self._tok.encode(smiles, truncation=True,
                                    max_length=max_length)
        return self._tok.encode(smiles)


def check_vocab_alignment(tokenizer, chemberta_params) -> None:
    """Fail loudly when tokenizer ids cannot index the checkpoint's
    embedding rows — the failure mode is otherwise SILENT (caches full of
    wrong-row embeddings that train to garbage)."""
    rows = chemberta_params["word_embeddings"]["embedding"].shape[0]
    if tokenizer.vocab_size > rows:
        raise ValueError(
            f"tokenizer vocab ({tokenizer.vocab_size}) exceeds the "
            f"checkpoint's embedding rows ({rows}) — the tokenizer does not "
            "belong to this checkpoint; pass the checkpoint's own tokenizer "
            "files via --chemberta-tokenizer")
    if isinstance(tokenizer, HFTokenizer):
        return
    # the first-party regex tokenizer is only valid with RANDOM-INIT
    # weights (its ids are self-assigned); with a real checkpoint the ids
    # would be misaligned even if the sizes happen to fit
    raise ValueError(
        "a real ChemBERTa checkpoint requires its own HF tokenizer files "
        "(--chemberta-tokenizer <dir with vocab.json+merges.txt or "
        "tokenizer.json>); the built-in regex tokenizer's ids do not match "
        "any pretrained embedding table")
