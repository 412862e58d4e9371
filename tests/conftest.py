"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on the host (the CI/dev box has at most one
real TPU chip): XLA exposes 8 virtual CPU devices so pjit/shard_map paths run
with real collectives.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
