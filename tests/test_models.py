"""Model forward shape/numerics tests (CPU, tiny config, jitted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from druglamp_tpu.models.registry import build_model
from tests.util import make_batch, tiny_config

B = 4
CFG = tiny_config()
ND, NP = 24, 40


def _build(name):
    model = build_model(name, CFG, n_drug_feature=ND, n_prot_feature=NP)
    batch = jax.tree.map(jnp.asarray, make_batch(CFG, B, n_drug_feature=ND, n_prot_feature=NP))
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                           batch, jax.random.key(9), method="init_all")
    return model, batch, variables


@pytest.mark.parametrize("name", ["DrugLAMPwoLLM", "DrugLAMP", "DrugLAMP2C2P"])
def test_forward_shapes(name):
    model, batch, variables = _build(name)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert out["score"].shape == (B, 1)
    assert np.all(np.isfinite(np.asarray(out["score"])))
    assert out["vd"].shape == (B, CFG.drug.max_nodes, CFG.n_hidden)
    site_seq = CFG.protein.seq_len // CFG.protein.site_len
    assert out["vp"].shape == (B, site_seq, CFG.n_hidden)
    if name == "DrugLAMP2C2P":
        assert out["cm_inputs"]["drug"].shape == (B, CFG.drug.max_nodes, CFG.n_hidden)
        assert out["cm_inputs"]["aug_prot"].shape == (B, site_seq, CFG.n_hidden)
    else:
        assert out["cm_inputs"] is None


def test_train_mode_mutates_batch_stats():
    model, batch, variables = _build("DrugLAMPwoLLM")
    out, mutated = jax.jit(
        lambda v, b, r: model.apply(v, b, train=True, rngs={"dropout": r},
                                    mutable=["batch_stats"])
    )(variables, batch, jax.random.key(2))
    before = variables["batch_stats"]["protein_extractor"]["bn1"]["BatchNorm_0"]["mean"]
    after = mutated["batch_stats"]["protein_extractor"]["bn1"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_eval_deterministic():
    model, batch, variables = _build("DrugLAMPwoLLM")
    f = jax.jit(lambda v, b: model.apply(v, b, train=False)["score"])
    assert np.allclose(np.asarray(f(variables, batch)), np.asarray(f(variables, batch)))


def test_need_attn_returns_raw_logits():
    model, batch, variables = _build("DrugLAMPwoLLM")
    out = model.apply(variables, batch, train=False, need_attn=True)
    site_seq = CFG.protein.seq_len // CFG.protein.site_len
    assert out["A_v_gca"].shape == (B, 1, site_seq, CFG.drug.max_nodes)


def test_ssl_loss_method():
    model, batch, variables = _build("DrugLAMP")
    out, mutated = model.apply(variables, batch, train=True,
                               rngs={"dropout": jax.random.key(2)},
                               mutable=["batch_stats"])
    losses, _ = model.apply(
        {"params": variables["params"], "batch_stats": mutated["batch_stats"]},
        out["ssl_inputs"], jax.random.key(3), True,
        method="ssl_loss", mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(4)})
    assert np.isfinite(float(losses["prot_ssl"])) and float(losses["prot_ssl"]) > 0
    assert np.isfinite(float(losses["drug_ssl"]))


def test_ssl_loss_wollm_vp_mode():
    model, batch, variables = _build("DrugLAMPwoLLM")
    out, mutated = model.apply(variables, batch, train=True,
                               rngs={"dropout": jax.random.key(2)},
                               mutable=["batch_stats"])
    assert out["ssl_inputs"]["xp"] is None and out["ssl_inputs"]["xd"] is None
    losses, _ = model.apply(
        {"params": variables["params"], "batch_stats": mutated["batch_stats"]},
        out["ssl_inputs"], jax.random.key(3), True,
        method="ssl_loss", mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(4)})
    assert float(losses["drug_ssl"]) == 0.0
    assert float(losses["prot_ssl"]) > 0


def test_cm_loss_method():
    model, batch, variables = _build("DrugLAMP2C2P")
    out, mutated = model.apply(variables, batch, train=True,
                               rngs={"dropout": jax.random.key(2)},
                               mutable=["batch_stats"])
    gt = np.full((B, B), -1.0, np.float32)
    gt[0, 0] = 1.0
    gt[0, 1] = 0.0
    gt[1, 0] = 0.0
    gt[1, 1] = 1.0
    gt_arrays = {
        "p_index": jnp.arange(B, dtype=jnp.int32),
        "p_valid": jnp.asarray([True, True, False, False]),
        "d_index": jnp.arange(B, dtype=jnp.int32),
        "d_valid": jnp.asarray([True, True, False, False]),
        "gt": jnp.asarray(gt),
    }
    loss, _ = model.apply(
        {"params": variables["params"], "batch_stats": mutated["batch_stats"]},
        out["cm_inputs"], gt_arrays, 0.5, True,
        method="cm_loss", mutable=["batch_stats"])
    assert np.isfinite(float(loss)) and float(loss) >= 0


def test_grads_flow():
    model, batch, variables = _build("DrugLAMPwoLLM")

    def loss_fn(params):
        out, _ = model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                             batch, train=True, rngs={"dropout": jax.random.key(5)},
                             mutable=["batch_stats"])
        from druglamp_tpu.losses.classification import binary_cross_entropy
        _, loss = binary_cross_entropy(out["score"], batch["labels"])
        return loss

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # classifier + extractors must receive gradient
    g = grads["mlp_classifier"]["fc1"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0
    g2 = grads["drug_extractor"]["layer_0"]["res_connection"]["kernel"]
    assert float(jnp.abs(g2).sum()) > 0


def test_onehot_embed_matches_gather(monkeypatch):
    """DRUGLAMP_ONEHOT_EMBED=1 replaces the ProteinCNN embedding gather with
    a one-hot matmul (nn/protein_cnn.py).  Forward values are exact (each
    output element is one product); the table gradient — a scatter-add vs a
    dense onehotᵀ@g reduction — may differ only in summation order."""
    from druglamp_tpu.nn.protein_cnn import ProteinCNN

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.integers(0, 27, size=(4, 72)), jnp.int32)
    fill = jnp.asarray(rng.integers(0, 2, size=(4, 72)), jnp.float32)
    model = ProteinCNN(embedding_dim=16, num_filters=(8, 8, 8))
    variables = model.init(jax.random.key(0), v, fill)

    def run(on):
        monkeypatch.setenv("DRUGLAMP_ONEHOT_EMBED", "1" if on else "0")

        def loss(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                v, fill, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        val, grads = jax.jit(jax.value_and_grad(loss))(variables["params"])
        return float(val), jax.tree.map(np.asarray, grads)

    v0, g0 = run(False)
    v1, g1 = run(True)
    np.testing.assert_allclose(v1, v0, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
