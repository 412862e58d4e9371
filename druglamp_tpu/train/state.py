"""Train state: params, batch stats, and the three AdamW optimizer states.

The reference builds THREE torch AdamW optimizers over the same parameter set
(main.py:158-160) with different LRs for the cls/SSL/CM losses.  Here each is
an optax chain equivalent to torch AdamW (β=(0.9, 0.999), eps 1e-8, decoupled
weight decay 0.01 — torch's default, which the reference silently trains
with) *without* a baked-in learning rate: the epoch-level cosine-warmup LR is
passed into the train step as a scalar and multiplies the whole update (the
decayed-weights term included, matching torch's p -= lr·(adam + wd·p)).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.struct
import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

WEIGHT_DECAY = 0.01
B1, B2, EPS = 0.9, 0.999, 1e-8


def make_adamw_tx() -> optax.GradientTransformation:
    """AdamW direction without LR (scale by -lr inside the step)."""
    return optax.chain(
        optax.scale_by_adam(b1=B1, b2=B2, eps=EPS),
        optax.add_decayed_weights(WEIGHT_DECAY),
    )


def _flat_opt_default() -> bool:
    return os.environ.get("DRUGLAMP_FLAT_OPT", "0") == "1"


@flax.struct.dataclass
class FlatAdamWState:
    """AdamW moments over ONE raveled parameter buffer.

    The per-leaf optax update compiles to one small fused kernel per
    parameter leaf (~100 leaves × m/v/p traffic); on a latency-bound step
    (roofline_r4: measured 8.7 ms vs 2.0 ms FLOP floor at bs 16) the
    serialization of many tiny kernels is a candidate cost.  Raveling
    grads/params makes the whole AdamW update three wide fused kernels.
    Elementwise math is identical to make_adamw_tx (test_train.py asserts
    equivalence); gated by DRUGLAMP_FLAT_OPT=1 pending a measured win.
    """

    m: jnp.ndarray
    v: jnp.ndarray
    count: jnp.ndarray


def init_flat_opt(params) -> FlatAdamWState:
    flat, _ = jax.flatten_util.ravel_pytree(params)
    return FlatAdamWState(m=jnp.zeros_like(flat), v=jnp.zeros_like(flat),
                          count=jnp.zeros((), jnp.int32))


def _apply_optimizer_flat(opt_state: FlatAdamWState, grads, params, lr):
    g, _ = jax.flatten_util.ravel_pytree(grads)
    p, unravel = jax.flatten_util.ravel_pytree(params)
    count = opt_state.count + 1
    m = B1 * opt_state.m + (1.0 - B1) * g
    v = B2 * opt_state.v + (1.0 - B2) * (g * g)
    # optax.bias_correction: decay**count computed in the moment dtype
    mhat = m / (1.0 - B1 ** count.astype(m.dtype))
    vhat = v / (1.0 - B2 ** count.astype(v.dtype))
    u = mhat / (jnp.sqrt(vhat) + EPS) + WEIGHT_DECAY * p
    return unravel(p - lr * u), FlatAdamWState(m=m, v=v, count=count)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_cls: Any
    opt_ssl: Optional[Any]
    opt_cm: Optional[Any]
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, use_ssl: bool, use_cm: bool,
               flat_opt: Optional[bool] = None) -> "TrainState":
        flat = _flat_opt_default() if flat_opt is None else flat_opt
        params = variables["params"]
        init = init_flat_opt if flat else make_adamw_tx().init
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_cls=init(params),
            opt_ssl=init(params) if use_ssl else None,
            opt_cm=init(params) if use_cm else None,
            step=jnp.zeros((), jnp.int32),
        )


def apply_optimizer(opt_state, grads, params, lr):
    """One AdamW step: p ← p − lr·(adam(g) + wd·p); returns (params, opt_state)."""
    if isinstance(opt_state, FlatAdamWState):
        new_params, new_opt_state = _apply_optimizer_flat(opt_state, grads,
                                                          params, lr)
        return new_params, new_opt_state
    tx = make_adamw_tx()
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return new_params, new_opt_state
