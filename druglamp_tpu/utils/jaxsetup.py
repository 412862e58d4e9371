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


def release_host_memory() -> None:
    """Return glibc free-list pages to the OS (``malloc_trim(0)``).

    Long training runs grow host RSS by ~0.3 GB/epoch on LLM-stream models
    (round-2 sweeps were OOM-killed at ~130 GB, logs/queue_r2.status rc=137):
    roughly half of that growth is allocator free-list retention from the
    per-epoch churn of large host buffers (stacked scan chunks, np.asarray
    state copies for checkpointing) that glibc never returns on its own —
    measured by tools/leak_probe.py --trim, which flattens that component.
    Calling this once per epoch is ~1 ms and bounds it.  No-op off glibc.
    """
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def default_cache_dir() -> str:
    """Persistent-compile-cache location: a gitignored dir INSIDE the repo
    workspace (`<repo>/.jax_cache`), not under $HOME.

    The round-4 driver bench paid a 388 s cold headline (BENCH_r04) because
    the cache primed by the builder lived in ``~/.cache`` and the driver ran
    with a wiped/different home; the repo workspace is the one filesystem
    both the builder session and the end-of-round driver run share.  Falls
    back to $HOME if the package is installed outside a writable tree."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(cand, exist_ok=True)
        return cand
    except OSError:
        return os.path.join(os.path.expanduser("~"), ".cache",
                            "druglamp_jax")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (huge win on remote-compile
    TPU attachments where a cold compile of the train step takes minutes)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR") or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
