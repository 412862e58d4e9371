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

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

WEIGHT_DECAY = 0.01


def make_adamw_tx() -> optax.GradientTransformation:
    """AdamW direction without LR (scale by -lr inside the step)."""
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(WEIGHT_DECAY),
    )


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_cls: Any
    opt_ssl: Optional[Any]
    opt_cm: Optional[Any]
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, use_ssl: bool, use_cm: bool) -> "TrainState":
        tx = make_adamw_tx()
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_cls=tx.init(params),
            opt_ssl=tx.init(params) if use_ssl else None,
            opt_cm=tx.init(params) if use_cm else None,
            step=jnp.zeros((), jnp.int32),
        )


def apply_optimizer(opt_state, grads, params, lr):
    """One AdamW step: p ← p − lr·(adam(g) + wd·p); returns (params, opt_state)."""
    tx = make_adamw_tx()
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return new_params, new_opt_state
