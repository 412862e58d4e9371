"""Kernel backend selection (pallas on TPU / xla fallback)."""

from __future__ import annotations

import jax

_BACKEND: str | None = None  # None = auto


def set_backend(name: str | None) -> None:
    """'pallas', 'xla', or None for auto (pallas iff running on TPU)."""
    global _BACKEND
    assert name in (None, "pallas", "xla")
    _BACKEND = name


def get_backend() -> str:
    if _BACKEND is not None:
        return _BACKEND
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"
