"""Jitted train/eval step functions, one variant per epoch-gate combination.

The reference gates SSL to every EPOCH_STEP-th epoch and CM from INIT_EPOCH
(trainer.py:192-193); in torch that leaves unused parameters (hence
``ddp_find_unused_parameters_true``).  The TPU-native design compiles one
step function per (use_ssl, use_cm, calibrate) combination — gating is
epoch-level, so at most a handful of compilations, each with *no* wasted
FLOPs (SURVEY §5.8).

Gradient semantics (config.solver.grad_mode):

- ``per_loss`` (default): one shared forward, one vjp per active loss (unit
  cotangents pick each loss's gradient out of the same linearization), each
  optimizer applies *its own* loss's gradient.  This is the documented intent
  of the reference's three-optimizer setup.
- ``legacy_aliased``: reproduces the literal reference behaviour
  (trainer.py:198-229 with torch≤1.x ``zero_grad(set_to_none=False)``):
  each ``opt_*.zero_grad()`` wipes ALL parameters' grads, so by step time
  every optimizer applies the gradients of the LAST computed loss (cm if
  active, else ssl, else cls).  (One unreproducible corner: torch skips
  params whose grad is None — params outside every loss graph receive no
  weight decay there; here they receive zero-grad AdamW updates.)

The CM loss-weight power-of-10 calibration (trainer.py:214-219) runs inside
the jitted step via lax.while_loop during the INIT_EPOCH (calibrate=True
variant) and is carried as a scalar in/out.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from druglamp_tpu.data.encoding import decode_batch
from druglamp_tpu.losses.classification import binary_cross_entropy, cross_entropy_logits
from druglamp_tpu.train.state import TrainState, apply_optimizer


class StepOutput(NamedTuple):
    state: TrainState
    cls_loss: jnp.ndarray
    ssl_loss: jnp.ndarray
    cm_loss: jnp.ndarray
    probs: jnp.ndarray
    cm_weight: jnp.ndarray


def _cls_loss(score, labels, n_class: int):
    if n_class == 1:
        return binary_cross_entropy(score, labels)
    return cross_entropy_logits(score, labels)


def _calibrate(cm_loss, cls_loss, w):
    """Power-of-10 weight calibration (reference trainer.py:214-219)."""

    def pos(w):
        w = jax.lax.while_loop(lambda w: cm_loss * w / 10.0 > cls_loss,
                               lambda w: w / 10.0, w)
        w = jax.lax.while_loop(lambda w: cm_loss * w * 10.0 < cls_loss,
                               lambda w: w * 10.0, w)
        return w

    return jax.lax.cond(cm_loss > 0, pos, lambda w: w, w)


def _remat_wrap(losses_fn: Callable) -> Callable:
    """Optionally rematerialize the loss forward (DRUGLAMP_REMAT env gate).

    On a bytes-bound step (docs/PERFORMANCE.md roofline), trading FLOPs for
    fewer saved activations is the canonical TPU lever (jax.checkpoint).
    Modes:
      - unset/'none': save-everything default (XLA decides).
      - 'dots': save matmul outputs only, recompute elementwise chains
        (jax.checkpoint_policies.checkpoint_dots) — cheap recompute, drops
        the elementwise intermediates from HBM.
      - 'full': save nothing but inputs; backward re-runs the forward.
    Remat recomputes the SAME ops, so trajectories stay numerically
    identical (tests/test_train.py::test_remat_step_matches_default).
    """
    mode = os.environ.get("DRUGLAMP_REMAT", "none").lower()
    if mode in ("", "none", "0"):
        return losses_fn
    if mode == "dots":
        return jax.checkpoint(
            losses_fn, policy=jax.checkpoint_policies.checkpoint_dots)
    if mode == "full":
        return jax.checkpoint(losses_fn)
    raise ValueError(f"DRUGLAMP_REMAT={mode!r}: expected none|dots|full")


def _make_step_body(model, use_ssl: bool, use_cm: bool, calibrate: bool,
                    grad_mode: str, n_class: int) -> Callable:
    """The un-jitted single-step transition shared by the per-step jit
    (make_train_step) and the epoch-in-scan driver (make_epoch_step)."""

    def step_body(state: TrainState, batch: Dict[str, Any], rng,
                  lr_cls, lr_ssl, lr_cm, margin, cm_weight) -> StepOutput:
        batch = dict(batch)
        store = batch.pop("_store", None)
        batch = decode_batch(batch, store)
        drop1, drop2, mlm = jax.random.split(rng, 3)

        def losses_fn(params):
            out, muts = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rngs={"dropout": drop1},
                mutable=["batch_stats"])
            probs, cls_loss = _cls_loss(out["score"], batch["labels"], n_class)
            stats = muts["batch_stats"]

            ssl_loss = jnp.float32(0.0)
            if use_ssl:
                ssl_dict, muts2 = model.apply(
                    {"params": params, "batch_stats": stats},
                    out["ssl_inputs"], mlm, True,
                    method="ssl_loss", mutable=["batch_stats"],
                    rngs={"dropout": drop2})
                stats = muts2["batch_stats"]
                ssl_loss = (ssl_dict["prot_ssl"] + ssl_dict["drug_ssl"]) * 0.1

            cm_raw = jnp.float32(0.0)
            if use_cm:
                cm_raw, muts3 = model.apply(
                    {"params": params, "batch_stats": stats},
                    out["cm_inputs"], batch["cm"], margin, True,
                    method="cm_loss", mutable=["batch_stats"])
                stats = muts3["batch_stats"]

            return (cls_loss, ssl_loss, cm_raw), (stats, probs)

        losses, vjp_fn, (new_stats, probs) = jax.vjp(_remat_wrap(losses_fn),
                                                     state.params, has_aux=True)
        cls_loss, ssl_loss, cm_raw = losses

        w = _calibrate(cm_raw, cls_loss, cm_weight) if calibrate else cm_weight
        cm_loss = cm_raw * w

        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        g_cls = vjp_fn((one, zero, zero))[0]
        g_ssl = vjp_fn((zero, one, zero))[0] if use_ssl else None
        g_cm = None
        if use_cm:
            g_cm = vjp_fn((zero, zero, one))[0]
            g_cm = jax.tree.map(lambda g: g * w, g_cm)

        if grad_mode == "legacy_aliased":
            g_last = g_cm if use_cm else (g_ssl if use_ssl else g_cls)
            g_cls = g_last
            g_ssl = g_last if use_ssl else None
            g_cm = g_last if use_cm else None

        params, opt_cls = apply_optimizer(state.opt_cls, g_cls, state.params, lr_cls)
        opt_ssl, opt_cm = state.opt_ssl, state.opt_cm
        if use_ssl:
            params, opt_ssl = apply_optimizer(state.opt_ssl, g_ssl, params, lr_ssl)
        if use_cm:
            params, opt_cm = apply_optimizer(state.opt_cm, g_cm, params, lr_cm)

        new_state = state.replace(params=params, batch_stats=new_stats,
                                  opt_cls=opt_cls, opt_ssl=opt_ssl,
                                  opt_cm=opt_cm, step=state.step + 1)
        return StepOutput(new_state, cls_loss, ssl_loss, cm_loss, probs, w)

    return step_body


def make_train_step(model, use_ssl: bool, use_cm: bool, calibrate: bool = False,
                    grad_mode: str = "per_loss", n_class: int = 1) -> Callable:
    """Build the jitted per-step train function for one gate combination."""
    body = _make_step_body(model, use_ssl, use_cm, calibrate, grad_mode, n_class)
    return functools.partial(jax.jit, donate_argnums=(0,))(body)


class EpochOutput(NamedTuple):
    state: TrainState
    cls_losses: jnp.ndarray   # (S,)
    ssl_losses: jnp.ndarray   # (S,)
    cm_losses: jnp.ndarray    # (S,)
    cm_weight: jnp.ndarray    # scalar, post-chunk
    rng: jnp.ndarray          # advanced key for the next chunk


def make_epoch_step(model, use_ssl: bool, use_cm: bool, calibrate: bool = False,
                    grad_mode: str = "per_loss", n_class: int = 1) -> Callable:
    """Build the jitted epoch-chunk function: ONE dispatch runs S train steps
    via lax.scan over a stacked batch (leading axis = step).

    Per-step dispatch is the dominant cost on tunneled/remote TPU hosts
    (~100ms/step observed vs ~3ms device compute); scanning an epoch chunk
    amortizes dispatch, the per-step scalar transfers, and the rng splits
    into one call.  The rng/weight threading reproduces the per-step loop
    exactly: carry (state, cm_weight, rng), body splits the carry rng the
    same way Trainer.fit does, so loop mode and scan mode produce identical
    trajectories (tests/test_train.py::test_scan_epoch_matches_loop).
    """
    body = _make_step_body(model, use_ssl, use_cm, calibrate, grad_mode, n_class)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_step(state: TrainState, stacked: Dict[str, Any], rng,
                   lr_cls, lr_ssl, lr_cm, margin, cm_weight) -> EpochOutput:
        stacked = dict(stacked)
        store = stacked.pop("_store", None)   # device-resident, not scanned

        def scan_body(carry, batch):
            state, w, rng = carry
            rng, step_rng = jax.random.split(rng)
            if store is not None:
                batch = {**batch, "_store": store}
            out = body(state, batch, step_rng, lr_cls, lr_ssl, lr_cm, margin, w)
            return ((out.state, out.cm_weight, rng),
                    (out.cls_loss, out.ssl_loss, out.cm_loss))

        (state, w, rng), (cls_l, ssl_l, cm_l) = jax.lax.scan(
            scan_body, (state, cm_weight, rng), stacked)
        return EpochOutput(state, cls_l, ssl_l, cm_l, w, rng)

    return epoch_step


# pre-gathered (S,B,L,F) embedding xs above this many bytes fall back to
# per-step gathers (HBM safety; v5e has 16 GB and the model itself is small)
_PREGATHER_BUDGET = int(os.environ.get("DRUGLAMP_PREGATHER_BUDGET",
                                       str(6 << 30)))


def _pregather_embeddings(data_tree, emb_store, idx, active: bool):
    """One whole-chunk embedding gather hoisted out of the scan (see
    make_epoch_step_gather docstring).  Returns None (feature off / store
    absent / over budget) or a dict of (S, B, ...) arrays whose per-step
    slices are exactly what decode_batch's store block would produce."""
    if not active or emb_store is None:
        return None
    S, B = idx.shape
    de, pe = emb_store["drug_emb"], emb_store["prot_emb"]
    nbytes = S * B * (de[0].size * de.dtype.itemsize
                      + pe[0].size * pe.dtype.itemsize)
    if nbytes > _PREGATHER_BUDGET:
        return None
    flat = idx.reshape(-1)
    dord = jnp.take(data_tree["pair_drug"], flat, axis=0)
    pord = jnp.take(data_tree["pair_prot"], flat, axis=0)

    def g(src, ids):
        out = jnp.take(src, ids, axis=0)
        return out.reshape((S, B) + src.shape[1:])

    return {"xd": g(de, dord), "d_ntok": g(emb_store["drug_len"], dord),
            "xp_src": g(pe, pord), "xp_len": g(emb_store["prot_len"], pord)}


def make_epoch_step_gather(model, use_ssl: bool, use_cm: bool,
                           include_llm: bool, emb_ordinals: bool,
                           calibrate: bool = False,
                           grad_mode: str = "per_loss",
                           n_class: int = 1) -> Callable:
    """Epoch-chunk driver for the device-resident dataset (data/device_data):
    ONE dispatch runs S steps, each GATHERING its batch from the uploaded
    store by (S, B) pair indices instead of consuming host-stacked arrays.
    Per-chunk H2D shrinks from ~MBs of batch data to the index array (~KBs);
    host assembly disappears entirely.  Trajectories are identical to
    make_epoch_step fed by BatchLoader on the same index order
    (tests/test_device_data.py::test_gather_trajectory_matches_scan).

    LLM-embedding gathers are HOISTED out of the scan: the r5 on-chip trace
    (docs/artifacts/xprof_epoch_r5.log) showed XLA's per-step lowering of
    ``take(prot_emb[2001,1024,640], 16 ids)`` streaming the WHOLE store
    every step (5.9 + 2.0 ms of the 17.5 ms step = 45%), while one
    whole-chunk gather streams it once per dispatch.  The pre-gathered
    (S, B, L, F) buffers ride the scan as xs (~1.7 GB at chunk 64/bs 16 —
    guarded by _PREGATHER_BUDGET with fallback to per-step gathers)."""
    from druglamp_tpu.data.device_data import gather_compact_batch

    body = _make_step_body(model, use_ssl, use_cm, calibrate, grad_mode, n_class)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_step(state: TrainState, idx, valid, data_tree, emb_store, rng,
                   lr_cls, lr_ssl, lr_cm, margin, cm_weight) -> EpochOutput:
        pref = _pregather_embeddings(data_tree, emb_store, idx,
                                     include_llm and emb_ordinals)

        def scan_body(carry, step_in):
            state, w, rng = carry
            step_idx, step_valid, step_pref = step_in
            rng, step_rng = jax.random.split(rng)
            batch = gather_compact_batch(data_tree, step_idx, step_valid,
                                         include_llm, emb_ordinals, emb_store)
            if step_pref is not None:
                del batch["drug_ord"], batch["prot_ord"]
                batch.update(step_pref)          # xd/d_ntok/xp_src/xp_len
            elif emb_store is not None:
                batch["_store"] = emb_store
            out = body(state, batch, step_rng, lr_cls, lr_ssl, lr_cm, margin, w)
            return ((out.state, out.cm_weight, rng),
                    (out.cls_loss, out.ssl_loss, out.cm_loss))

        (state, w, rng), (cls_l, ssl_l, cm_l) = jax.lax.scan(
            scan_body, (state, cm_weight, rng), (idx, valid, pref))
        return EpochOutput(state, cls_l, ssl_l, cm_l, w, rng)

    return epoch_step


def make_eval_scan_gather(model, include_llm: bool, emb_ordinals: bool,
                          n_class: int = 1) -> Callable:
    """Eval twin of make_epoch_step_gather: scores S index-gathered batches
    in one dispatch; with the dataset device-resident, a whole eval pass
    ships only the (S, B) index array and pulls back (S, B) probs."""
    from druglamp_tpu.data.device_data import gather_compact_batch

    step = _eval_body(model, n_class)

    @jax.jit
    def eval_scan(params, batch_stats, idx, valid, data_tree, emb_store):
        pref = _pregather_embeddings(data_tree, emb_store, idx,
                                     include_llm and emb_ordinals)

        def body(_, step_in):
            step_idx, step_valid, step_pref = step_in
            batch = gather_compact_batch(data_tree, step_idx, step_valid,
                                         include_llm, emb_ordinals, emb_store)
            if step_pref is not None:
                del batch["drug_ord"], batch["prot_ord"]
                batch.update(step_pref)
            elif emb_store is not None:
                batch["_store"] = emb_store
            return None, step(params, batch_stats, batch)

        _, (probs, losses) = jax.lax.scan(body, None, (idx, valid, pref))
        return probs, losses                      # (S, B), (S,)

    return eval_scan


def make_repeat_step(model, use_ssl: bool, use_cm: bool, iters: int,
                     calibrate: bool = False, grad_mode: str = "per_loss",
                     n_class: int = 1) -> Callable:
    """ONE dispatch runs ``iters`` train steps on the SAME batch (lax.scan).

    Measurement utility (bench.py): on tunneled/remote TPU hosts the
    per-dispatch cost (~100–150 ms observed) dwarfs device step compute
    (~4 ms), so a per-step dispatch loop measures the host, not the chip —
    and collapses ~3× under concurrent host load.  Scanning ``iters`` steps
    into one program makes the throughput number device-bound and
    load-insensitive.  Unlike make_epoch_step this reuses one batch, so HBM
    holds a single copy regardless of ``iters``; rng is split per step so
    dropout/masking still vary.  Returns (new_state, per-step cls losses)."""
    body = _make_step_body(model, use_ssl, use_cm, calibrate, grad_mode, n_class)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def repeat_step(state: TrainState, batch: Dict[str, Any], rng,
                    lr_cls, lr_ssl, lr_cm, margin, cm_weight):
        batch_l = dict(batch)
        store = batch_l.pop("_store", None)

        def scan_body(carry, _):
            state, w, rng = carry
            rng, step_rng = jax.random.split(rng)
            b = {**batch_l, "_store": store} if store is not None else batch_l
            out = body(state, b, step_rng, lr_cls, lr_ssl, lr_cm, margin, w)
            return (out.state, out.cm_weight, rng), out.cls_loss

        (state, _, _), cls_l = jax.lax.scan(
            scan_body, (state, cm_weight, rng), None, length=iters)
        return state, cls_l

    return repeat_step


def make_eval_scan(model, n_class: int = 1) -> Callable:
    """Jitted eval over a step-stacked batch: ONE dispatch scores S batches
    via lax.scan (same dispatch-amortization as make_epoch_step; eval
    becomes the per-epoch dispatch bottleneck once training scans)."""
    step = _eval_body(model, n_class)

    @jax.jit
    def eval_scan(params, batch_stats, stacked):
        stacked = dict(stacked)
        store = stacked.pop("_store", None)

        def body(_, batch):
            if store is not None:
                batch = {**batch, "_store": store}
            return None, step(params, batch_stats, batch)

        _, (probs, losses) = jax.lax.scan(body, None, stacked)
        return probs, losses                      # (S, B), (S,)

    return eval_scan


def _eval_body(model, n_class: int = 1) -> Callable:
    def eval_step(params, batch_stats, batch):
        batch = dict(batch)
        store = batch.pop("_store", None)
        batch = decode_batch(batch, store)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, train=False)
        probs, _ = _cls_loss(out["score"], batch["labels"], n_class)
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones_like(probs)
        # masked mean BCE for logging
        logits = jnp.squeeze(out["score"], -1).astype(jnp.float32)
        labels = batch["labels"].astype(jnp.float32)
        per = (jnp.maximum(logits, 0) - logits * labels
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        loss = (per * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return probs, loss

    return eval_step


def make_eval_step(model, n_class: int = 1) -> Callable:
    """Jitted eval step: probabilities + loss over valid rows."""
    return jax.jit(_eval_body(model, n_class))
