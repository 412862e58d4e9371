"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on the host (the dev box has at most one
real TPU chip): XLA exposes 8 virtual CPU devices so pjit/shard_map paths run
with real collectives.

The axon TPU bootstrap (sitecustomize) programmatically sets
jax_platforms='axon,cpu' at interpreter start, so the env var alone is not
enough — we re-force the config after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", f"tests must run on cpu, got {jax.default_backend()}"
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
