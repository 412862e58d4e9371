"""Pallas TPU kernels for the attention hot spots, with jnp fallbacks.

Backend selection: Pallas kernels are used automatically on TPU unless
disabled via ``set_backend('xla')``; on CPU (tests) the jnp fallback runs.
"""

from druglamp_tpu.kernels.dispatch import set_backend, get_backend  # noqa: F401
