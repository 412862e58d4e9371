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

Gates (TFT_GATES):
  cls  (default) — classification loss only.
  ssl  — cls + the MLM/SimSiam SSL head firing EVERY epoch, with
         framework-matched masking: the stochastic mlm_mask is replaced in
         BOTH frameworks by the same deterministic mask (every 5th nonzero
         position — the test_full_model_parity convention), and the torch
         side applies per-loss AdamW exactly like train/steps.py per_loss
         mode (both grads taken at the pre-step params, cls applied first).

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
LR = 1e-4
SSL_LR = 3e-5
DATA_ROOT = os.environ.get("DRUGLAMP_DATA_ROOT", "/root/reference/datasets")


def build(cfg):
    from druglamp_tpu.data.cache import ZeroEmbeddings
    from druglamp_tpu.data.dataset import DTIDataset
    from druglamp_tpu.data.loader import BatchLoader

    kw = dict(max_nodes=cfg.drug.max_nodes, seq_len=cfg.protein.seq_len,
              max_prot_resis=cfg.protein.max_resis)
    train_ds = DTIDataset(DATA_ROOT, "human", "random", "train.csv",
                          cutoff=TRAIN_ROWS, **kw)
    test_ds = DTIDataset(DATA_ROOT, "human", "random", "test.csv",
                         cutoff=EVAL_ROWS, **kw)
    emb = ZeroEmbeddings(384, 640)
    ltrain = BatchLoader(train_ds, BS, shuffle=True, drop_last=True,
                         embeddings=emb, seed=0, include_llm=True,
                         llm_dtype=np.float32, compact=False, prefetch=0)
    ltest = BatchLoader(test_ds, BS, shuffle=False, drop_last=False,
                        embeddings=emb, include_llm=True,
                        llm_dtype=np.float32, compact=False, prefetch=0)
    return ltrain, ltest


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from druglamp_tpu.config import Config
    from druglamp_tpu.eval.metrics import auroc, average_precision
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

    use_ssl = GATES == "ssl"
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

    ltrain, ltest = build(cfg)
    model = build_model("DrugLAMP2C2P", cfg)
    ex = ltrain.first_batch(0)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           jax.tree.map(jnp.asarray, ex), jax.random.key(2),
                           method="init_all")
    state = TrainState.create(variables, use_ssl=use_ssl, use_cm=False)
    step = make_train_step(model, use_ssl=use_ssl, use_cm=False)
    eval_step = make_eval_step(model)

    mirror = TorchDrugLAMP2C2P(jax.tree.map(np.asarray, variables["params"]),
                               cfg, 384, 640, track_running_stats=True)
    params_t = list(mirror.parameters())
    opt = torch.optim.AdamW(params_t, lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.01)
    opt_ssl = torch.optim.AdamW(params_t, lr=SSL_LR, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=0.01) if use_ssl else None

    def grads_snapshot():
        return [p.grad.clone() if p.grad is not None else None
                for p in params_t]

    def apply_with(optimizer, grads):
        for p, g in zip(params_t, grads):
            # per_loss semantics (train/steps.py): params outside a loss's
            # graph get a ZERO gradient, not a skipped update
            p.grad = g if g is not None else torch.zeros_like(p)
        optimizer.step()

    warmup = max(1, int(EPOCHS * 0.2)) if EPOCHS > 1 else 0
    rng = jax.random.key(7)
    t0 = time.time()
    for ep in range(EPOCHS):
        lr = cosine_warmup_restarts_lr(ep, EPOCHS, LR, warmup_steps=warmup)
        lr_ssl = cosine_warmup_restarts_lr(ep, EPOCHS, SSL_LR,
                                           warmup_steps=warmup)
        for g in opt.param_groups:
            g["lr"] = lr
        if opt_ssl is not None:
            for g in opt_ssl.param_groups:
                g["lr"] = lr_ssl
        jl, tl, jsl, tsl = [], [], [], []
        for batch in ltrain.epoch(ep):
            rng, k = jax.random.split(rng)
            out = step(state, jax.tree.map(jnp.asarray, batch), k,
                       jnp.float32(lr), jnp.float32(lr_ssl), jnp.float32(0.0),
                       jnp.float32(0.5), jnp.float32(1.0))
            state = out.state
            jl.append(float(out.cls_loss))
            jsl.append(float(out.ssl_loss))

            mirror.train()
            bt = {kk: torch.tensor(np.ascontiguousarray(v))
                  for kk, v in batch.items() if kk not in ("cm", "valid")}
            out_t = mirror(bt)
            _, loss = bce(out_t["score"], bt["labels"])
            if not use_ssl:
                opt.zero_grad()
                loss.backward()
                opt.step()
            else:
                # both grads at the PRE-step params (one shared
                # linearization, like the vjp in train/steps.py), then
                # cls applied first, ssl second
                ssl_loss = mirror.ssl_loss(bt, out_t, det_mask_np)
                opt.zero_grad(set_to_none=True)
                loss.backward(retain_graph=True)
                g_cls = grads_snapshot()
                opt.zero_grad(set_to_none=True)
                ssl_loss.backward()
                g_ssl = grads_snapshot()
                apply_with(opt, g_cls)
                apply_with(opt_ssl, g_ssl)
                tsl.append(ssl_loss.item())
            tl.append(loss.item())
        msg = (f"[tft] epoch {ep} lr={lr:.2e} jax_loss={np.mean(jl):.4f} "
               f"torch_loss={np.mean(tl):.4f}")
        if use_ssl:
            msg += (f" jax_ssl={np.mean(jsl):.4f} torch_ssl={np.mean(tsl):.4f}")
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
        "protocol": {"train_rows": TRAIN_ROWS, "eval_rows": int(len(ys)),
                     "epochs": EPOCHS, "batch": BS, "lr": LR,
                     "gates": GATES, "dropout": 0.0,
                     "dtype": "float32", "embeddings": "zeros"},
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
