"""Two-framework end-to-end training parity at reduced scale.

The strongest in-container answer to "does druglamp_tpu train to the same
quality as the PyTorch reference?" that goes beyond step-level parity
(docs/PARITY.md): train the SAME model TWICE from identical flax-init
weights on an identical batch stream — once with druglamp_tpu's jitted
train step, once with the independent torch mirror
(tests/torch_mirror.TorchDrugLAMP2C2P, running-stat BN) under torch
AdamW — then eval both on the same held-out rows and compare AUROC/AUPRC.

Protocol (reduced so the torch side fits a single CPU core):
  human/random train.csv rows[:TFT_TRAIN_ROWS], batch TFT_BS,
  TFT_EPOCHS epochs, pmma dropout 0, fp32, zero LLM embeddings,
  cosine-warmup LR (train/schedule.py) applied identically.

Gates (TFT_GATES) — which aux losses are ENABLED (cls always runs):
  cls  (default) — classification loss only.
  ssl  — + the MLM/SimSiam SSL head, with framework-matched masking: the
         stochastic mlm_mask is replaced in BOTH frameworks by the same
         deterministic mask (every 5th nonzero position — the
         test_full_model_parity convention).
  cm   — + the margin-scheduled cross-modality triplet loss (2C2P).
  ssl_cm — both.

Epoch gating (TFT_EPOCH_STEP / TFT_INIT_EPOCH — reference
trainer.py:192-193 semantics, default 1/1 = every epoch): SSL fires on
epochs where (epoch+1) % EPOCH_STEP == 0; CM from epoch+1 >= INIT_EPOCH,
with the one-time power-of-10 weight calibration during the INIT_EPOCH
epoch (trainer.py:214-219) and the margin schedule stepped per CM epoch
(trainer.py:254) — each framework calibrates against its OWN losses, as
the real systems do.  SSL/CM cosine schedules advance only on epochs
where their loss fired (train/trainer.py:215-218).

Gradient modes (TFT_GRAD_MODE): per_loss (default — train/steps.py's
documented-intent mode, each optimizer applies its own loss's gradient,
grads at the pre-step params, applied cls→ssl→cm) or legacy_aliased
(the literal reference trainer.py:179-231 with torch-1.12
zero_grad(set_to_none=False): every optimizer applies the LAST computed
loss's gradients — torch side uses tests/torch_mirror.reference_train_step).

After 100+ optimizer steps the two trajectories are NOT bit-comparable
(fp32 noise compounds chaotically); the claim under test is that both
land at statistically equivalent quality, which is what "AUROC parity
with the reference" means operationally.

    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/two_framework_train.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_ROWS = int(os.environ.get("TFT_TRAIN_ROWS", "128"))
EVAL_ROWS = int(os.environ.get("TFT_EVAL_ROWS", "256"))
EPOCHS = int(os.environ.get("TFT_EPOCHS", "8"))
BS = int(os.environ.get("TFT_BS", "8"))
GATES = os.environ.get("TFT_GATES", "cls")
EPOCH_STEP = int(os.environ.get("TFT_EPOCH_STEP", "1"))
INIT_EPOCH = int(os.environ.get("TFT_INIT_EPOCH", "1"))
GRAD_MODE = os.environ.get("TFT_GRAD_MODE", "per_loss")
DATA = os.environ.get("TFT_DATA", "human")
SPLIT = os.environ.get("TFT_SPLIT", "random")
LR = 1e-4
SSL_LR = 3e-5
CM_LR = 3e-5   # 2C2P recipe (configs/DrugLAMP2C2P.yaml)
MAX_MARGIN = 0.5
DATA_ROOT = os.environ.get("DRUGLAMP_DATA_ROOT", "/root/reference/datasets")


def build(cfg):
    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.loader import BatchLoader

    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    train_ds = DTIDataset(DATA_ROOT, DATA, SPLIT, "train.csv",
                          cutoff=TRAIN_ROWS, **kw)
    test_ds = DTIDataset(DATA_ROOT, DATA, SPLIT, "test.csv",
                         cutoff=EVAL_ROWS, table=train_ds.table, **kw)
    emb = ZeroEmbeddings(384, 640)
    ltrain = BatchLoader(train_ds, BS, shuffle=True, drop_last=True,
                         embeddings=emb, seed=0, include_llm=True,
                         llm_dtype=np.float32, compact=False, prefetch=0)
    ltest = BatchLoader(test_ds, BS, shuffle=False, drop_last=False,
                        embeddings=emb, include_llm=True,
                        llm_dtype=np.float32, compact=False, prefetch=0)
    return train_ds, ltrain, ltest


def _torch_calibrate(cm_raw: float, cls: float, w: float) -> float:
    """Power-of-10 weight calibration (reference trainer.py:214-219)."""
    if cm_raw <= 0:
        return w
    while cm_raw * w / 10.0 > cls:
        w /= 10.0
    while cm_raw * w * 10.0 < cls:
        w *= 10.0
    return w


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from druglamp_tpu.config import Config
    from druglamp_tpu.eval.metrics import auroc, average_precision
    from druglamp_tpu.losses.schedules import MarginSchedule
    from druglamp_tpu.models.registry import build_model
    from druglamp_tpu.train.schedule import cosine_warmup_restarts_lr
    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_eval_step, make_train_step
    from tests.torch_mirror import TorchDrugLAMP2C2P, bce

    torch.manual_seed(0)
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, pmma_dropout=0.0,
        solver=dataclasses.replace(cfg.solver, compute_dtype="float32"))

    use_ssl = GATES in ("ssl", "ssl_cm")
    use_cm = GATES in ("cm", "ssl_cm")
    assert GRAD_MODE in ("per_loss", "legacy_aliased"), GRAD_MODE
    if use_ssl:
        # framework-matched masking: replace the stochastic mlm_mask in the
        # JAX model with the deterministic every-5th-nonzero mask (the
        # test_full_model_parity convention); the torch mirror gets the
        # numpy twin below
        import druglamp_tpu.models.ssl as ssl_module

        def det_mlm_mask_jax(seq, rng, **kw):
            idx = jnp.arange(seq.shape[1])[None, :]
            mask = (seq != 0) & (idx % 5 == 0)
            labels = jnp.where(mask, seq, 0)
            return jnp.where(mask, 26, seq), labels, mask

        ssl_module.mlm_mask = det_mlm_mask_jax

    def det_mask_np(vp):
        mask = (vp != 0) & (np.arange(vp.shape[1])[None, :] % 5 == 0)
        return (np.where(mask, 26, vp).astype(vp.dtype),
                np.where(mask, vp, 0))

    train_ds, ltrain, ltest = build(cfg)
    model = build_model("DrugLAMP2C2P", cfg)
    ex = ltrain.first_batch(0)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           jax.tree.map(jnp.asarray, ex), jax.random.key(2),
                           method="init_all")
    state = TrainState.create(variables, use_ssl=use_ssl, use_cm=use_cm)
    # one jitted step per (compute_ssl, compute_cm, calibrate) gate combo,
    # exactly as the trainer builds them (train/trainer.py:141-149)
    step_fns = {}

    def get_step(cssl, ccm, cal):
        key = (cssl, ccm, cal)
        if key not in step_fns:
            step_fns[key] = make_train_step(model, use_ssl=cssl, use_cm=ccm,
                                            calibrate=cal,
                                            grad_mode=GRAD_MODE)
        return step_fns[key]

    eval_step = make_eval_step(model)

    mirror = TorchDrugLAMP2C2P(jax.tree.map(np.asarray, variables["params"]),
                               cfg, 384, 640, track_running_stats=True)
    params_t = list(mirror.parameters())
    mk_opt = lambda lr0: torch.optim.AdamW(params_t, lr=lr0,
                                           betas=(0.9, 0.999), eps=1e-8,
                                           weight_decay=0.01)
    opt = mk_opt(LR)
    opt_ssl = mk_opt(SSL_LR) if use_ssl else None
    opt_cm = mk_opt(CM_LR) if use_cm else None

    def grads_snapshot():
        return [p.grad.clone() if p.grad is not None else None
                for p in params_t]

    def apply_with(optimizer, grads, scale=1.0):
        for p, g in zip(params_t, grads):
            # per_loss semantics (train/steps.py): params outside a loss's
            # graph get a ZERO gradient, not a skipped update
            p.grad = g * scale if g is not None else torch.zeros_like(p)
        optimizer.step()

    warmup = max(1, int(EPOCHS * 0.2)) if EPOCHS > 1 else 0
    margin_sched = MarginSchedule(m_ori=MAX_MARGIN, n_epoch=EPOCHS,
                                  n_re=max(EPOCHS + 1, 10))
    rng = jax.random.key(7)
    ssl_steps = cm_steps = 0
    cm_w_j = cm_w_t = 1.0
    t0 = time.time()
    for ep in range(EPOCHS):
        compute_ssl = use_ssl and ((ep + 1) % EPOCH_STEP == 0)
        compute_cm = use_cm and ((ep + 1) >= INIT_EPOCH)
        calibrate = compute_cm and ((ep + 1) == INIT_EPOCH)
        lr = cosine_warmup_restarts_lr(ep, EPOCHS, LR, warmup_steps=warmup)
        lr_ssl = cosine_warmup_restarts_lr(ssl_steps, EPOCHS, SSL_LR,
                                           warmup_steps=warmup)
        lr_cm = cosine_warmup_restarts_lr(cm_steps, EPOCHS, CM_LR,
                                          warmup_steps=warmup)
        margin = margin_sched.margin
        for g in opt.param_groups:
            g["lr"] = lr
        if opt_ssl is not None:
            for g in opt_ssl.param_groups:
                g["lr"] = lr_ssl
        if opt_cm is not None:
            for g in opt_cm.param_groups:
                g["lr"] = lr_cm
        step = get_step(compute_ssl, compute_cm, calibrate)
        order = ltrain._order(ep)
        jl, tl, jsl, tsl, jcl, tcl = [], [], [], [], [], []
        for bi, batch in enumerate(ltrain.epoch(ep)):
            rng, k = jax.random.split(rng)
            out = step(state, jax.tree.map(jnp.asarray, batch), k,
                       jnp.float32(lr), jnp.float32(lr_ssl),
                       jnp.float32(lr_cm), jnp.float32(margin),
                       jnp.float32(cm_w_j))
            state = out.state
            if calibrate:
                cm_w_j = float(out.cm_weight)
            jl.append(float(out.cls_loss))
            jsl.append(float(out.ssl_loss))
            jcl.append(float(out.cm_loss))

            idx = order[bi * BS : (bi + 1) * BS]
            prot_ids = train_ds.prot_ords[idx]
            drug_ids = train_ds.drug_ords[idx]
            mirror.train()
            bt = {kk: torch.tensor(np.ascontiguousarray(v))
                  for kk, v in batch.items() if kk not in ("cm", "valid")}
            if GRAD_MODE == "legacy_aliased" and (compute_ssl or compute_cm):
                # literal reference trainer.py:179-231 semantics
                # (torch_mirror.reference_train_step, inlined so the
                # power-of-10 calibration happens on the SAME training
                # forward's losses, as the jitted calibrate variant does)
                out_t = mirror(bt)
                _, cls_loss = bce(out_t["score"], bt["labels"])
                opt.zero_grad(set_to_none=False)
                cls_loss.backward(retain_graph=True)
                if compute_ssl:
                    opt_ssl.zero_grad(set_to_none=False)
                    ssl_loss = mirror.ssl_loss(bt, out_t, det_mask_np)
                    ssl_loss.backward(retain_graph=compute_cm)
                    tsl.append(ssl_loss.item())
                if compute_cm:
                    opt_cm.zero_grad(set_to_none=False)
                    cm_raw = mirror.cm_loss(out_t, prot_ids, drug_ids,
                                            bt["labels"].numpy(), margin)
                    if calibrate:
                        cm_w_t = _torch_calibrate(cm_raw.item(),
                                                  cls_loss.item(), cm_w_t)
                    (cm_raw * cm_w_t).backward()
                    tcl.append(cm_raw.item() * cm_w_t)
                opt.step()
                if compute_ssl:
                    opt_ssl.step()
                if compute_cm:
                    opt_cm.step()
                tl.append(cls_loss.item())
                continue
            out_t = mirror(bt)
            _, loss = bce(out_t["score"], bt["labels"])
            if not compute_ssl and not compute_cm:
                opt.zero_grad()
                loss.backward()
                opt.step()
            else:
                # all grads at the PRE-step params (one shared
                # linearization, like the vjp in train/steps.py), then
                # applied cls → ssl → cm with each loss's own optimizer
                retain = True
                opt.zero_grad(set_to_none=True)
                loss.backward(retain_graph=retain)
                g_cls = grads_snapshot()
                g_ssl = g_cm = None
                if compute_ssl:
                    ssl_loss = mirror.ssl_loss(bt, out_t, det_mask_np)
                    opt.zero_grad(set_to_none=True)
                    ssl_loss.backward(retain_graph=compute_cm)
                    g_ssl = grads_snapshot()
                    tsl.append(ssl_loss.item())
                if compute_cm:
                    cm_raw = mirror.cm_loss(out_t, prot_ids, drug_ids,
                                            bt["labels"].numpy(), margin)
                    if calibrate:
                        cm_w_t = _torch_calibrate(cm_raw.item(), loss.item(),
                                                  cm_w_t)
                    opt.zero_grad(set_to_none=True)
                    cm_raw.backward()
                    g_cm = grads_snapshot()
                    tcl.append(cm_raw.item() * cm_w_t)
                apply_with(opt, g_cls)
                if g_ssl is not None:
                    apply_with(opt_ssl, g_ssl)
                if g_cm is not None:
                    apply_with(opt_cm, g_cm, scale=cm_w_t)
            tl.append(loss.item())
        # epoch-end scheduler/margin stepping (reference trainer.py:243-254)
        if compute_ssl:
            ssl_steps += 1
        if compute_cm:
            cm_steps += 1
            margin_sched.step()
        msg = (f"[tft] epoch {ep} lr={lr:.2e} jax_loss={np.mean(jl):.4f} "
               f"torch_loss={np.mean(tl):.4f}")
        if compute_ssl:
            msg += (f" jax_ssl={np.mean(jsl):.4f} torch_ssl={np.mean(tsl):.4f}")
        if compute_cm:
            msg += (f" jax_cm={np.mean(jcl):.4f} torch_cm={np.mean(tcl):.4f}"
                    f" w_j={cm_w_j:g} w_t={cm_w_t:g} m={margin:.3f}")
        print(msg + f" ({time.time() - t0:.0f}s)", flush=True)

    # --- shared-row eval, each framework on its own BN running stats --------
    jp, tp, ys = [], [], []
    mirror.eval()
    for batch in ltest.epoch(0):
        probs, _ = eval_step(state.params, state.batch_stats,
                             jax.tree.map(jnp.asarray, batch))
        valid = batch["valid"].astype(bool)
        jp.append(np.asarray(probs)[valid])
        with torch.no_grad():
            bt = {kk: torch.tensor(np.ascontiguousarray(v))
                  for kk, v in batch.items() if kk not in ("cm", "valid")}
            p, _ = bce(mirror(bt)["score"], bt["labels"])
        tp.append(p.numpy()[valid])
        ys.append(batch["labels"][valid])
    jp, tp, ys = map(np.concatenate, (jp, tp, ys))

    res = {
        "protocol": {"data": DATA, "split": SPLIT,
                     "train_rows": TRAIN_ROWS, "eval_rows": int(len(ys)),
                     "epochs": EPOCHS, "batch": BS, "lr": LR,
                     "gates": GATES, "grad_mode": GRAD_MODE,
                     "epoch_step": EPOCH_STEP, "init_epoch": INIT_EPOCH,
                     "dropout": 0.0, "dtype": "float32",
                     "embeddings": "zeros"},
        "cm_weight": {"jax": cm_w_j, "torch": cm_w_t} if use_cm else None,
        "jax_auroc": round(auroc(jp, ys), 4),
        "torch_auroc": round(auroc(tp, ys), 4),
        "jax_auprc": round(average_precision(jp, ys), 4),
        "torch_auprc": round(average_precision(tp, ys), 4),
        "score_corr": round(float(np.corrcoef(jp, tp)[0, 1]), 4),
    }
    res["auroc_delta"] = round(abs(res["jax_auroc"] - res["torch_auroc"]), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
