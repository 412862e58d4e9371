"""Shared test helpers (re-exported from the package's synthetic-data utils)."""

from druglamp_tpu.utils.synthetic import make_batch, tiny_config  # noqa: F401
