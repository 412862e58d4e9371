"""Whole-model parity: flax DrugLAMP2C2P vs the independent torch mirror.

The strongest AUROC-parity evidence obtainable in this container (the
PyTorch reference's dgl/lightning deps are not installed): compose the full
model in torch from the documented math, load identical weights, and assert

  (a) forward score parity (train-mode BN, fp32),
  (b) per-loss (cls / ssl / cm) gradient parity over the full param tree,
  (c) ``legacy_aliased`` three-optimizer update-trajectory parity over 12
      steps against the literal reference trainer semantics
      (trainer.py:179-231, zero_grad(set_to_none=False)).

MLM mask sampling is the one part that cannot match across RNGs; both sides
use an injected deterministic mask (every 5th non-pad token, all replaced),
so the loss/grad path is fully exercised while the sampling distribution
itself is covered by tests/test_losses.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # heavy torch-mirror suite (module fixture ~1 min)

import druglamp_tpu.models.ssl as ssl_module
from druglamp_tpu.config import SolverConfig
from druglamp_tpu.data.loader import build_cm_arrays
from druglamp_tpu.models.registry import build_model
from druglamp_tpu.utils.synthetic import make_batch, tiny_config

from tests.torch_mirror import TorchDrugLAMP2C2P, bce, reference_train_step

B = 6
ND, NP = 12, 20
PROT_IDS = np.array([0, 0, 1, 1, 2, 2])
DRUG_IDS = np.array([0, 1, 2, 3, 4, 5])
LABELS = np.array([1, 0, 1, 0, 0, 0], np.float32)  # prot 2 → fallback path


def det_mlm_mask_jax(seq, rng, **kw):
    idx = jnp.arange(seq.shape[1])[None, :]
    mask = (seq != 0) & (idx % 5 == 0)
    labels = jnp.where(mask, seq, 0)
    return jnp.where(mask, 26, seq), labels, mask


def det_mask_np(vp):
    mask = (vp != 0) & (np.arange(vp.shape[1])[None, :] % 5 == 0)
    return np.where(mask, 26, vp).astype(vp.dtype), np.where(mask, vp, 0)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_hidden=16, max_nodes=32, site_seq=16, pmma_dropout=0.0,
                      solver=SolverConfig(compute_dtype="float32"))
    batch_np = make_batch(cfg, B, n_drug_feature=ND, n_prot_feature=NP)
    batch_np["labels"] = LABELS.copy()
    cm = build_cm_arrays(PROT_IDS, DRUG_IDS, batch_np["labels"])

    model = build_model("DrugLAMP2C2P", cfg, n_drug_feature=ND, n_prot_feature=NP)
    batch_j = jax.tree.map(jnp.asarray, {**batch_np, "cm": cm})
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)},
                           batch_j, jax.random.key(2), method="init_all")

    mirror = TorchDrugLAMP2C2P(
        jax.tree.map(np.asarray, variables["params"]), cfg, ND, NP)
    batch_t = {k: torch.tensor(np.asarray(v)) for k, v in batch_np.items()}
    return cfg, model, variables, batch_np, batch_j, mirror, batch_t


def test_forward_score_parity(setup):
    _, model, variables, _, batch_j, mirror, batch_t = setup
    out, _ = model.apply(variables, batch_j, train=True,
                         mutable=["batch_stats"], rngs={"dropout": jax.random.key(3)})
    with torch.no_grad():
        ref = mirror(batch_t)
    np.testing.assert_allclose(np.asarray(out["score"]),
                               ref["score"].numpy(), rtol=1e-3, atol=1e-4)


def _flax_losses_fn(model, variables, batch_j):
    """Same composition as train.steps.make_train_step's losses_fn."""
    from druglamp_tpu.losses.classification import binary_cross_entropy

    def losses_fn(params):
        out, muts = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch_j, train=True, rngs={"dropout": jax.random.key(3)},
            mutable=["batch_stats"])
        _, cls_loss = binary_cross_entropy(out["score"], batch_j["labels"])
        stats = muts["batch_stats"]
        ssl_dict, muts2 = model.apply(
            {"params": params, "batch_stats": stats},
            out["ssl_inputs"], jax.random.key(4), True,
            method="ssl_loss", mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(5)})
        ssl_loss = (ssl_dict["prot_ssl"] + ssl_dict["drug_ssl"]) * 0.1
        cm_loss, _ = model.apply(
            {"params": params, "batch_stats": muts2["batch_stats"]},
            out["cm_inputs"], batch_j["cm"], jnp.float32(0.5), True,
            method="cm_loss", mutable=["batch_stats"])
        return cls_loss, ssl_loss, cm_loss

    return losses_fn


def _grad_trees(model, variables, batch_j):
    losses_fn = _flax_losses_fn(model, variables, batch_j)
    losses, vjp_fn = jax.vjp(lambda p: losses_fn(p), variables["params"])
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    g_cls = vjp_fn((one, zero, zero))[0]
    g_ssl = vjp_fn((zero, one, zero))[0]
    g_cm = vjp_fn((zero, zero, one))[0]
    return losses, g_cls, g_ssl, g_cm


def _torch_grads(mirror, batch_t, loss):
    params = list(mirror.p.values())
    grads = torch.autograd.grad(loss, params, retain_graph=True,
                                allow_unused=True)
    return {k: (g.numpy() if g is not None else np.zeros_like(p.detach().numpy()))
            for (k, p), g in zip(mirror.p.items(), grads)}


def test_per_loss_gradient_parity(setup, monkeypatch):
    _, model, variables, batch_np, batch_j, mirror, batch_t = setup
    monkeypatch.setattr(ssl_module, "mlm_mask", det_mlm_mask_jax)

    losses, g_cls, g_ssl, g_cm = _grad_trees(model, variables, batch_j)
    cls_j, ssl_j, cm_j = (float(x) for x in losses)

    out_t = mirror(batch_t)
    _, cls_t = bce(out_t["score"], batch_t["labels"])
    ssl_t = mirror.ssl_loss(batch_t, out_t, det_mask_np)
    cm_t = mirror.cm_loss(out_t, PROT_IDS, DRUG_IDS, LABELS, 0.5)

    assert abs(cls_j - cls_t.item()) < 1e-5
    assert abs(ssl_j - ssl_t.item()) < 1e-5
    assert abs(cm_j - cm_t.item()) < 1e-5

    from flax import traverse_util
    for g_tree, loss_t, tag in ((g_cls, cls_t, "cls"), (g_ssl, ssl_t, "ssl"),
                                (g_cm, cm_t, "cm")):
        gt = _torch_grads(mirror, batch_t, loss_t)
        gj = {"/".join(k): np.asarray(v) for k, v in
              traverse_util.flatten_dict(g_tree).items()}
        assert set(gj) == set(gt)
        for k in gj:
            np.testing.assert_allclose(
                gj[k], gt[k], rtol=5e-3, atol=5e-5,
                err_msg=f"{tag} grad mismatch at {k}")


def test_adamw_three_optimizer_application_parity():
    """Exact optimizer-math parity: identical gradients fed to the optax
    AdamW chain (sequential cls→ssl→cm application, train/state.py) and to
    three torch AdamW optimizers stepped in reference order.  20 steps,
    tight tolerance — isolates the update rule from model fp noise."""
    from druglamp_tpu.train.state import apply_optimizer, make_adamw_tx

    r = np.random.RandomState(0)
    params = {"a": r.randn(4, 3).astype(np.float32),
              "b": r.randn(7).astype(np.float32)}
    grads_seq = [jax.tree.map(lambda p: r.randn(*p.shape).astype(np.float32) *
                              10.0 ** r.randint(-6, 1), params)
                 for _ in range(20)]

    tx = make_adamw_tx()
    pj = jax.tree.map(jnp.asarray, params)
    opts = [tx.init(pj) for _ in range(3)]
    lrs = (1e-3, 3e-4, 1e-4)

    pt = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params.items()}
    t_opts = [torch.optim.AdamW(pt.values(), lr=l, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=0.01) for l in lrs]

    for g in grads_seq:
        gj = jax.tree.map(jnp.asarray, g)
        for i in range(3):
            pj, opts[i] = apply_optimizer(opts[i], gj, pj, lrs[i])
        for k in pt:
            pt[k].grad = torch.tensor(g[k])
        for o in t_opts:
            o.step()
    for k in params:
        np.testing.assert_allclose(np.asarray(pj[k]), pt[k].detach().numpy(),
                                   rtol=1e-5, atol=1e-7)


def test_legacy_aliased_trajectory_parity(setup, monkeypatch):
    """12 steps of the full 3-loss, 3-optimizer step.  With SSL+CM active,
    every parameter appears in some loss graph, so torch's skip-None-grads
    corner (the one documented divergence, train/steps.py) does not bite.

    Tolerances are noise-aware: Adam's first update is ≈ sign(g)·lr per
    param, so fp32 sign flips on near-zero gradients produce O(lr) param
    deltas that grow *linearly* (measured ~1e-3/step).  A semantic aliasing
    error (applying the wrong loss's gradients) diverges at 1e-1 scale
    within a few steps, far outside these bounds; the update rule itself is
    pinned exactly by test_adamw_three_optimizer_application_parity and the
    gradients by test_per_loss_gradient_parity."""
    cfg, model, variables, batch_np, batch_j, mirror_unused, batch_t = setup
    monkeypatch.setattr(ssl_module, "mlm_mask", det_mlm_mask_jax)

    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_train_step

    state = TrainState.create(variables, use_ssl=True, use_cm=True)
    step = make_train_step(model, use_ssl=True, use_cm=True,
                           grad_mode="legacy_aliased")

    mirror = TorchDrugLAMP2C2P(
        jax.tree.map(np.asarray, variables["params"]), cfg, ND, NP)
    lr, lr_ssl, lr_cm = 1e-3, 3e-4, 1e-4
    mk = lambda l: torch.optim.AdamW(mirror.parameters(), lr=l,
                                     betas=(0.9, 0.999), eps=1e-8,
                                     weight_decay=0.01)
    opt, opt_ssl, opt_cm = mk(lr), mk(lr_ssl), mk(lr_cm)

    for i in range(12):
        out = step(state, batch_j, jax.random.key(10 + i), jnp.float32(lr),
                   jnp.float32(lr_ssl), jnp.float32(lr_cm), jnp.float32(0.5),
                   jnp.float32(1.0))
        state = out.state
        cls_t, ssl_t, cm_t = reference_train_step(
            mirror, opt, opt_ssl, opt_cm, batch_t, det_mask_np,
            PROT_IDS, DRUG_IDS, 0.5, 1.0)
        assert abs(float(out.cls_loss) - cls_t) < 8e-3, f"step {i} cls"
        assert abs(float(out.ssl_loss) - ssl_t) < 1e-3, f"step {i} ssl"
        assert abs(float(out.cm_loss) - cm_t) < 1e-3, f"step {i} cm"

    from flax import traverse_util
    pj = {"/".join(k): np.asarray(v) for k, v in
          traverse_util.flatten_dict(state.params).items()}
    for k, p in mirror.p.items():
        np.testing.assert_allclose(
            pj[k], p.detach().numpy(), atol=2e-2,
            err_msg=f"trajectory param divergence at {k}")


def test_trajectory_tolerance_rejects_wrong_aliasing(setup, monkeypatch):
    """Negative control for the 2e-2 trajectory gate: the most likely
    porting error — torch-2.x zero_grad semantics, where the three backwards
    ACCUMULATE and every optimizer applies g_cls+g_ssl+g_cm instead of the
    last loss's gradients (torch-1.12 zero_grad(set_to_none=False) wipes) —
    must diverge PAST the tolerance within the same 12 steps.  This pins the
    margin between fp32 sign-flip noise (test above) and a real aliasing
    bug: the gate provably separates them."""
    from tests.torch_mirror import wrong_accumulating_train_step

    cfg, model, variables, batch_np, batch_j, mirror_unused, batch_t = setup
    monkeypatch.setattr(ssl_module, "mlm_mask", det_mlm_mask_jax)

    from druglamp_tpu.train.state import TrainState
    from druglamp_tpu.train.steps import make_train_step

    state = TrainState.create(variables, use_ssl=True, use_cm=True)
    step = make_train_step(model, use_ssl=True, use_cm=True,
                           grad_mode="legacy_aliased")

    wrong = TorchDrugLAMP2C2P(
        jax.tree.map(np.asarray, variables["params"]), cfg, ND, NP)
    lr, lr_ssl, lr_cm = 1e-3, 3e-4, 1e-4
    mk = lambda l: torch.optim.AdamW(wrong.parameters(), lr=l,
                                     betas=(0.9, 0.999), eps=1e-8,
                                     weight_decay=0.01)
    opt, opt_ssl, opt_cm = mk(lr), mk(lr_ssl), mk(lr_cm)

    for i in range(12):
        out = step(state, batch_j, jax.random.key(10 + i), jnp.float32(lr),
                   jnp.float32(lr_ssl), jnp.float32(lr_cm), jnp.float32(0.5),
                   jnp.float32(1.0))
        state = out.state
        wrong_accumulating_train_step(
            wrong, opt, opt_ssl, opt_cm, batch_t, det_mask_np,
            PROT_IDS, DRUG_IDS, 0.5, 1.0)

    from flax import traverse_util
    pj = {"/".join(k): np.asarray(v) for k, v in
          traverse_util.flatten_dict(state.params).items()}
    worst = max(np.abs(pj[k] - p.detach().numpy()).max()
                for k, p in wrong.p.items())
    assert worst > 2e-2, (
        f"wrong-aliasing trajectory stayed within the parity tolerance "
        f"(max divergence {worst:.2e}) — the gate would not catch a real "
        f"aliasing bug; tighten it")
