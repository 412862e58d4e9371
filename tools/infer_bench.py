"""Inference throughput: jitted DrugLAMP forward (eval mode), pairs/s/chip.

Complements bench.py (train step) for the 'train+infer' north star.
    PYTHONPATH=. python tools/infer_bench.py [batch ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from druglamp_tpu.config import Config
from druglamp_tpu.models.registry import build_model
from druglamp_tpu.utils.jaxsetup import enable_compilation_cache
from druglamp_tpu.utils.synthetic import make_batch


def bench(batch_size: int) -> float:
    cfg = Config()
    batch = jax.tree.map(jnp.asarray, make_batch(cfg, batch_size,
                                                 n_drug_feature=384,
                                                 n_prot_feature=640))
    model = build_model("DrugLAMP", cfg)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b, jax.random.key(2), method="init_all"))(batch)
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)["score"])
    # two-point measurement: fixed dispatch/fetch costs cancel (see
    # druglamp_tpu.utils.profiling.device_time_ms)
    from druglamp_tpu.utils.profiling import device_time_ms

    ms = device_time_ms(fwd, variables, batch, n1=20, n2=80)
    return batch_size / (ms / 1e3)


if __name__ == "__main__":
    enable_compilation_cache()
    sizes = [int(a) for a in sys.argv[1:]] or [16, 64]
    for bs in sizes:
        print(f"inference bs={bs}: {bench(bs):.0f} pairs/s")
