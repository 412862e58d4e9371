"""JAX runtime setup helpers."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Re-apply the JAX_PLATFORMS env var as a config update.

    Some containers bootstrap an accelerator plugin from sitecustomize and
    pin ``jax_platforms`` programmatically at interpreter start, which
    silently overrides the env var; re-applying it here makes
    ``JAX_PLATFORMS=cpu python -m druglamp_tpu.cli.main ...`` behave as
    documented.  Must run before the first backend use.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (huge win on remote-compile
    TPU attachments where a cold compile of the train step takes minutes)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "druglamp_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
