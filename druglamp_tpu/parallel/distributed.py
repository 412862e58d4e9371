"""Multi-host initialization (DCN) — SURVEY §5.8's multi-host path.

The reference scales only within one host (Lightning DDP over visible GPUs).
Here multi-host runs initialize jax.distributed (coordinator via env/args)
and then use the same Mesh/NamedSharding code — data-parallel gradients ride
ICI within a slice and DCN across hosts through the same XLA collectives.

Call ``maybe_initialize_distributed()`` before any jax device use; it is a
no-op when no coordinator is configured (single-host).
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if configured; returns True if initialized.

    Configuration precedence: explicit args → JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars → cloud-TPU auto-detect
    (jax.distributed.initialize() with no args inside a multi-host TPU pod).
    """
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else \
        _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if addr is not None and nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc, process_id=pid)
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        # multi-worker TPU pod: jax auto-detects everything
        jax.distributed.initialize()
        return True
    return False


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
