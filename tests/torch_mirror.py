"""Whole-model torch mirror of DrugLAMP for trajectory-level parity tests.

An independent PyTorch implementation of the full DrugLAMP2C2P forward,
the SSL and CM auxiliary losses, and the reference's literal three-optimizer
training step (trainer.py:179-231 with torch-1.12 ``zero_grad(set_to_none=
False)`` semantics).  Parameters are *loaded from the flax param tree* so the
two frameworks compute from identical weights; every op is written from the
documented math (reference model/*.py), not translated from the JAX code.

Used by tests/test_full_model_parity.py to assert (a) forward score parity,
(b) per-loss gradient parity, (c) ``legacy_aliased`` update-trajectory parity.
"""

from __future__ import annotations

import itertools
import math
from typing import Dict

import numpy as np
import torch
import torch.nn.functional as F

GELU = lambda x: F.gelu(x, approximate="none")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


class TorchDrugLAMP2C2P(torch.nn.Module):
    """Functional torch mirror parameterized by the flax param tree."""

    def __init__(self, flax_params: Dict, cfg, n_drug_feature: int,
                 n_prot_feature: int, track_running_stats: bool = False):
        super().__init__()
        self.cfg = cfg
        self.site_len = cfg.protein.site_len
        self.seq_len = cfg.protein.seq_len
        self.nh = cfg.n_hidden
        self.n_heads = cfg.pmma.num_heads
        self.p = torch.nn.ParameterDict({
            k: torch.nn.Parameter(torch.tensor(v, dtype=torch.float32))
            for k, v in _flatten(flax_params).items()
        })
        # track_running_stats=True gives full torch BatchNorm1d semantics
        # (momentum 0.1 EMA of mean/unbiased var, used in eval mode) so the
        # mirror can run a real train→eval experiment
        # (tools/two_framework_train.py); False keeps the original
        # train-mode-only behavior for the step-parity tests.
        self.track_running_stats = track_running_stats
        self._bn_stats: Dict[str, tuple] = {}

    # --- primitives ---------------------------------------------------------

    def lin(self, x, name, bias=True):
        y = x @ self.p[f"{name}/kernel"]
        if bias:
            y = y + self.p[f"{name}/bias"]
        return y

    def ln(self, x, name, eps):
        C = x.shape[-1]
        return F.layer_norm(x, (C,), self.p[f"{name}/scale"],
                            self.p[f"{name}/bias"], eps)

    def _bn_apply(self, x, key, weight, bias):
        if not self.track_running_stats:
            return F.batch_norm(x, None, None, weight, bias,
                                training=True, eps=1e-5)
        if key not in self._bn_stats:
            C = x.shape[1]
            self._bn_stats[key] = (torch.zeros(C), torch.ones(C))
        rm, rv = self._bn_stats[key]
        return F.batch_norm(x, rm, rv, weight, bias, training=self.training,
                            momentum=0.1, eps=1e-5)

    def bn(self, x2d, name):
        """BatchNorm1d over (N, C); affine from flax params."""
        return self._bn_apply(x2d, name,
                              self.p[f"{name}/BatchNorm_0/scale"],
                              self.p[f"{name}/BatchNorm_0/bias"])

    # --- extractors ---------------------------------------------------------

    def gcn(self, node_feats, adj, degrees):
        x = node_feats @ self.p["drug_extractor/init_transform"]
        n = torch.clamp(degrees, min=1.0).rsqrt()
        adj_norm = n[:, :, None] * adj.float() * n[:, None, :]
        for i in range(3):
            pre = f"drug_extractor/layer_{i}"
            agg = adj_norm @ x
            h = F.relu(agg @ self.p[f"{pre}/graph_kernel"]
                       + self.p[f"{pre}/graph_bias"])
            h = h + F.relu(self.lin(x, f"{pre}/res_connection"))
            B, N, C = h.shape
            x = self.bn(h.reshape(B * N, C), f"{pre}/bn").reshape(B, N, C)
        return x

    def protein_cnn(self, v, fill):
        emb = self.p["protein_extractor/embedding"]
        x = emb[v.long()] * (v != 0).float().unsqueeze(-1)
        x = torch.cat([x, fill.unsqueeze(-1)], dim=-1)
        x = x.transpose(2, 1)  # (B, C, L)
        for i, k in enumerate(self.cfg.protein.kernel_size):
            kern = self.p[f"protein_extractor/conv{i + 1}/kernel"]  # (k, in, out)
            w = kern.permute(2, 1, 0)
            b = self.p[f"protein_extractor/conv{i + 1}/bias"]
            total = k - 1
            x = F.pad(x, (total // 2, total - total // 2))
            x = F.relu(F.conv1d(x, w, b))
            x = self._bn_apply(
                x, f"protein_extractor/bn{i + 1}",
                self.p[f"protein_extractor/bn{i + 1}/BatchNorm_0/scale"],
                self.p[f"protein_extractor/bn{i + 1}/BatchNorm_0/bias"])
        return x.transpose(2, 1)  # (B, L, C)

    # --- fusion -------------------------------------------------------------

    def gca(self, query, key, value, prefix):
        E = query.shape[-1]
        w = self.p[f"{prefix}/in_proj_weight"]  # (E, 3E)
        b = self.p[f"{prefix}/in_proj_bias"]
        q = (query @ w[:, :E] + b[:E]) * (E ** -0.5)   # 1 head: head_dim = E
        k = key @ w[:, E:2 * E] + b[E:2 * E]
        v = value @ w[:, 2 * E:] + b[2 * E:]
        attn = torch.softmax(q @ k.transpose(1, 2), dim=-1)
        return self.lin(attn @ v, f"{prefix}/out_proj")

    def mhla(self, v, prefix, nhead=8):
        a = GELU(self.lin(v, f"{prefix}/lin1"))
        a = self.lin(a, f"{prefix}/lin2")
        a = torch.softmax(a, dim=1).transpose(1, 2)       # (B, H, L)
        B, L, E = v.shape
        head_dim = E // nhead
        gated = a.reshape(B * nhead, L, 1) * v.reshape(B * nhead, L, head_dim)
        return gated.reshape(B, L, E)

    def fuse(self, p_tok, d_tok, stream):
        m = self.gca(p_tok, d_tok, d_tok, f"{stream}_gca")
        m = torch.cat([p_tok, m], dim=2)
        m = self.mhla(m, f"{stream}_mhla") + m
        return self.ln(m, f"{stream}_gca_norm", 1e-5)

    # --- adaptors ------------------------------------------------------------

    def prot_adaptor(self, xp):
        hx = xp
        t = GELU(self.lin(xp, "p_adaptor/lin1"))
        t = self.ln(t, "p_adaptor/norm", 1e-5)
        xp = self.lin(t, "p_adaptor/lin2") + hx
        xp = self.ln(GELU(self.lin(xp, "lin_p1")), "p_norm", 1e-5)
        return self.lin(xp, "lin_p2")

    def drug_adaptor(self, xd):
        xd = self.ln(GELU(self.lin(xd, "lin_d1")), "d_norm", 1e-5)
        return self.lin(xd, "lin_d2")

    # --- PMMA ----------------------------------------------------------------

    def _heads(self, x):
        B, L, E = x.shape
        H = self.n_heads
        return x.reshape(B, L, H, E // H).permute(0, 2, 1, 3)

    def _merge(self, x):
        B, H, L, D = x.shape
        return x.permute(0, 2, 1, 3).reshape(B, L, H * D)

    @staticmethod
    def _attn(q, k, v):
        d = q.shape[-1]
        return torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(d), dim=-1) @ v

    def _paired(self, p_in, m_in, block):
        pre = f"pmma/{block}/attn"
        q_p = self._heads(self.lin(p_in, f"{pre}/query"))
        k_p = self._heads(self.lin(p_in, f"{pre}/key"))
        v_p = self._heads(self.lin(p_in, f"{pre}/value"))
        q_m = self._heads(self.lin(m_in, f"{pre}/query_mol"))
        k_m = self._heads(self.lin(m_in, f"{pre}/key_mol"))
        v_m = self._heads(self.lin(m_in, f"{pre}/value_mol"))

        ap = torch.cat([self._merge(self._attn(q_p, k_p, v_p)),
                        self._merge(self._attn(q_m, k_p, v_p))], dim=-1)
        ap = self.lin(self.lin(ap, f"{pre}/fc"), f"{pre}/out")
        am = torch.cat([self._merge(self._attn(q_m, k_m, v_m)),
                        self._merge(self._attn(q_p, k_m, v_m))], dim=-1)
        am = self.lin(self.lin(am, f"{pre}/fc_mol"), f"{pre}/out_mol")
        return ap, am

    def _mlp(self, x, name):
        return self.lin(GELU(self.lin(x, f"{name}/fc1")), f"{name}/fc2")

    def pmma(self, prot, mol):
        mol = self.lin(mol, "pmma/mol_embeddings") + self.p["pmma/pe_mol"]
        x = prot + self.p["pmma/pe_prot"]
        for i in range(2):
            blk = f"block_{i}"
            p_in = self.ln(x, f"pmma/{blk}/attention_norm", 1e-6)
            m_in = self.ln(mol, f"pmma/{blk}/att_norm_mol", 1e-6)
            ap, am = self._paired(p_in, m_in, blk)
            x, mol = ap + x, am + mol
            x = self._mlp(self.ln(x, f"pmma/{blk}/ffn_norm", 1e-6),
                          f"pmma/{blk}/ffn") + x
            mol = self._mlp(self.ln(mol, f"pmma/{blk}/ffn_norm_mol", 1e-6),
                            f"pmma/{blk}/ffn_mol") + mol
        x = torch.cat([x, mol], dim=-1)
        for i in (2, 3):
            blk = f"block_{i}"
            pre = f"pmma/{blk}/attn"
            h = x
            a_in = self.ln(x, f"pmma/{blk}/attention_norm", 1e-6)
            q = self._heads(self.lin(a_in, f"{pre}/query"))
            k = self._heads(self.lin(a_in, f"{pre}/key"))
            v = self._heads(self.lin(a_in, f"{pre}/value"))
            x = self.lin(self._merge(self._attn(q, k, v)), f"{pre}/out") + h
            h = x
            x = self._mlp(self.ln(x, f"pmma/{blk}/ffn_norm", 1e-6),
                          f"pmma/{blk}/ffn") + h
        return self.ln(x, "pmma/encoder_norm", 1e-6)

    def classifier(self, f):
        x = self.bn(GELU(self.lin(f, "mlp_classifier/fc1")), "mlp_classifier/bn1")
        x = self.bn(GELU(self.lin(x, "mlp_classifier/fc2")), "mlp_classifier/bn2")
        x = self.bn(GELU(self.lin(x, "mlp_classifier/fc3")), "mlp_classifier/bn3")
        return self.lin(x, "mlp_classifier/fc4")

    # --- full forward ---------------------------------------------------------

    def forward(self, batch):
        vd = self.gcn(batch["drug_node_feats"], batch["drug_adj"],
                      batch["drug_degrees"])
        xp_full = torch.cat([batch["xp"], batch["p_fill"].unsqueeze(-1)], dim=-1)
        xd_full = torch.cat([batch["xd"], batch["d_fill"].unsqueeze(-1)], dim=-1)

        vp = self.protein_cnn(batch["vp"], batch["p_fill"])
        B, L, C = vp.shape
        site_seq = self.seq_len // self.site_len
        vp = vp.reshape(B, self.site_len, site_seq, C).mean(dim=1)
        xp_p = xp_full.reshape(B, self.site_len, site_seq, -1).mean(dim=1)

        xp_e = self.prot_adaptor(xp_p)
        xd_e = self.drug_adaptor(xd_full)

        mv = self.fuse(vp, vd, "v")
        mx = self.fuse(xp_e, xd_e, "x")

        f = self.pmma(mx, mv).mean(dim=1)
        score = self.classifier(f)
        return {"score": score, "vd": vd, "xd_full": xd_full,
                "xp_full": xp_full, "vp": vp, "xp_e": xp_e, "xd_e": xd_e}

    # --- auxiliary losses -------------------------------------------------------

    def ssl_loss(self, batch, out, mlm_fn):
        """mlm_fn(vp numpy) -> (masked_seq, labels) deterministic arrays."""
        masked_np, labels_np = mlm_fn(batch["vp"].numpy())
        masked = torch.tensor(masked_np)
        labels = torch.tensor(labels_np.astype(np.int64))

        def masked_ce(logits):
            logp = F.log_softmax(logits, dim=-1)
            nll = -logp.gather(-1, labels.unsqueeze(-1)).squeeze(-1)
            valid = (labels != 0).float()
            return (nll * valid).sum() / torch.clamp(valid.sum(), min=1.0)

        emb = self.protein_cnn(masked, batch["p_fill"])
        prot_ssl = (masked_ce(self.lin(emb, "ssl_model/to_logits"))
                    + masked_ce(self.lin(out["xp_full"],
                                         "ssl_model/llm_to_logits"))) / 2.0

        def simsiam_proj(x, net):
            x = x @ self.p[f"ssl_model/{net}/l1/kernel"]
            x = F.relu(self.bn(x, f"ssl_model/{net}/bn1"))
            x = x @ self.p[f"ssl_model/{net}/l2/kernel"]
            x = F.relu(self.bn(x, f"ssl_model/{net}/bn2"))
            x = x @ self.p[f"ssl_model/{net}/l3/kernel"]
            return F.batch_norm(x, None, None, training=True, eps=1e-5)

        def predictor(x):
            x = self.lin(x, "ssl_model/predictor/l1")
            x = F.relu(self.bn(x, "ssl_model/predictor/bn"))
            return self.lin(x, "ssl_model/predictor/l2")

        def negcos(x, y):
            return 2.0 - 2.0 * (F.normalize(x, dim=-1)
                                * F.normalize(y, dim=-1)).sum(-1)

        d1 = out["vd"].reshape(-1, out["vd"].shape[-1])
        d2 = out["xd_full"].reshape(-1, out["xd_full"].shape[-1])
        p1, p2 = simsiam_proj(d1, "net"), simsiam_proj(d2, "llm_net")
        drug_ssl = (negcos(predictor(p1), p2.detach())
                    + negcos(predictor(p2), p1.detach())).mean()
        return (prot_ssl + drug_ssl) * 0.1

    def cm_loss(self, out, prot_ids, drug_ids, labels, margin):
        """Reference-style dict/loop triplet mining (cross_modality.py:15-47)."""
        pid2t, did2t = {}, {}
        for t in range(len(prot_ids)):
            pid2t[int(prot_ids[t])] = t
            did2t[int(drug_ids[t])] = t
        gt = {pid: {did: -1.0 for did in did2t} for pid in pid2t}
        for t in range(len(prot_ids)):
            gt[int(prot_ids[t])][int(drug_ids[t])] = float(labels[t])
        for pid in gt:
            for did in gt[pid]:
                if gt[pid][did] < 0:
                    gt[pid][did] = 0.0

        p_rows = torch.tensor(list(pid2t.values()))
        d_rows = torch.tensor(list(did2t.values()))

        def embed(x, rows, name):
            x = x[rows].mean(dim=1)
            x = F.relu(self.bn_cm(x, f"cm_model/{name}/bn"))
            return self.lin(x, f"cm_model/{name}/lin")

        p = embed(out["vp"], p_rows, "prot2latent")
        ap = embed(out["xp_e"], p_rows, "aug_prot2latent")
        d = embed(out["vd"], d_rows, "drug2latent")
        ad = embed(out["xd_e"], d_rows, "aug_drug2latent")
        p_lats = torch.cat([p, ap], dim=-1) @ self.p["cm_model/to_prot_latent/kernel"]
        d_lats = torch.cat([d, ad], dim=-1) @ self.p["cm_model/to_drug_latent/kernel"]
        p_lats = p_lats / torch.clamp(p_lats.norm(dim=-1, keepdim=True), min=1e-12)
        d_lats = d_lats / torch.clamp(d_lats.norm(dim=-1, keepdim=True), min=1e-12)

        def dist(a, b):
            return 1.0 - torch.sigmoid((a * b).sum(-1))

        loss = torch.tensor(0.0)
        n_tri = 0
        for i, pid in enumerate(pid2t):
            pos = [j for j, did in enumerate(did2t) if gt[pid][did] == 1]
            neg = [j for j, did in enumerate(did2t) if gt[pid][did] == 0]
            if pos and neg:
                n_tri += len(pos) * len(neg)
                for jp, jn in itertools.product(pos, neg):
                    loss = loss + F.relu(dist(p_lats[i], d_lats[jp])
                                         - dist(p_lats[i], d_lats[jn]) + margin)
            elif neg:
                n_tri += len(neg)
                for jn in neg:
                    loss = loss + F.relu(dist(p_lats[i], p_lats[i])
                                         - dist(p_lats[i], d_lats[jn]) + margin)
        return loss / max(n_tri, 1)

    def bn_cm(self, x2d, name):
        """cm Mean2Embed BatchNorm (params not nested under BatchNorm_0)."""
        return self._bn_apply(x2d, name, self.p[f"{name}/scale"],
                              self.p[f"{name}/bias"])


def bce(score, labels):
    logits = score.squeeze(-1)
    return torch.sigmoid(logits), F.binary_cross_entropy_with_logits(
        logits, labels.float())


def reference_train_step(mirror, opt, opt_ssl, opt_cm, batch, mlm_fn,
                         prot_ids, drug_ids, margin, cm_weight,
                         use_ssl=True, use_cm=True):
    """Literal reference trainer.py:179-231 semantics with torch-1.12
    ``zero_grad(set_to_none=False)`` — each zero_grad wipes ALL grads, so
    every optimizer ends up applying the LAST computed loss's gradients."""
    out = mirror(batch)
    _, cls_loss = bce(out["score"], batch["labels"])
    opt.zero_grad(set_to_none=False)
    cls_loss.backward(retain_graph=use_ssl or use_cm)
    ssl_loss = cm_loss = None
    if use_ssl:
        opt_ssl.zero_grad(set_to_none=False)
        ssl_loss = mirror.ssl_loss(batch, out, mlm_fn)
        ssl_loss.backward(retain_graph=use_cm)
    if use_cm:
        opt_cm.zero_grad(set_to_none=False)
        cm_loss = mirror.cm_loss(out, prot_ids, drug_ids,
                                 batch["labels"].numpy(), margin) * cm_weight
        cm_loss.backward()
    opt.step()
    if use_ssl:
        opt_ssl.step()
    if use_cm:
        opt_cm.step()
    return cls_loss.item(), (ssl_loss.item() if use_ssl else 0.0), \
        (cm_loss.item() if use_cm else 0.0)


def wrong_accumulating_train_step(mirror, opt, opt_ssl, opt_cm, batch, mlm_fn,
                                  prot_ids, drug_ids, margin, cm_weight):
    """A plausible-but-WRONG port of trainer.py:179-231: keeps torch-2.x
    zero_grad defaults (grads ACCUMULATE across the three backwards instead
    of being wiped by each torch-1.12 zero_grad(set_to_none=False)), so the
    optimizers apply g_cls+g_ssl+g_cm rather than the last loss's gradients.
    Used only as a negative control: the trajectory-parity tolerance must
    reject this (tests/test_full_model_parity.py)."""
    out = mirror(batch)
    _, cls_loss = bce(out["score"], batch["labels"])
    opt.zero_grad(set_to_none=False)
    cls_loss.backward(retain_graph=True)
    ssl_loss = mirror.ssl_loss(batch, out, mlm_fn)
    ssl_loss.backward(retain_graph=True)
    cm_loss = mirror.cm_loss(out, prot_ids, drug_ids,
                             batch["labels"].numpy(), margin) * cm_weight
    cm_loss.backward()
    opt.step()
    opt_ssl.step()
    opt_cm.step()
    return cls_loss.item(), ssl_loss.item(), cm_loss.item()
