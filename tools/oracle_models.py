"""Independent PyTorch implementations of the reference's per-model math.

Every loss here is written from the REFERENCE's equations (file:line cited
per model below, all under /root/reference/recbole_cdr/model/
cross_domain_recommender/) while consuming the FRAMEWORK's parameter pytree
layout (converted to torch via :func:`to_torch`). Running the same batch
through a framework ``loss_fn`` and through these torch losses — with torch
autograd recomputing the backward pass from scratch — is the per-step
bit-equivalence evidence behind results/parity_oracle.md, committed as
``tests/test_oracle_equivalence.py``.

Two deliberate framework divergences from reference bugs are mirrored here
so the equivalence tests pin the *intended* semantics (both documented in
the model docstrings and PARITY.md):

- DTCDR/DMF (`dtcdr.py:135-175`): the reference scores target batches
  through the *source* towers (`dtcdr.py:196`), indexes item history values
  by user (`dtcdr.py:156`), and leaves a spurious 1.0 in the PAD column of
  every padded rating vector; the framework (and this oracle) uses the
  target towers, the item's history, and zeroes the PAD column.
- DTCDR/NeuMF ±inf fills (`dtcdr.py:54-59`) are clobbered by the
  reference's own ``apply(xavier_normal_initialization)`` — the effective
  behavior (plain xavier + elementwise maximum) is what both sides compute.

Usage: oracle = ORACLES[name]; loss = oracle.loss(tparams, batch, model, phase)
"""

import numpy as np
import scipy.sparse as sp
import torch
import torch.nn.functional as F


# ----------------------------------------------------------------- conversion

def to_torch(tree):
    """Framework param pytree -> same-structure torch tensors; float leaves
    require grad so ``loss.backward()`` reproduces the full gradient."""
    import jax

    def conv(x):
        a = np.asarray(x)
        t = torch.tensor(a)
        if t.is_floating_point():
            t.requires_grad_(True)
        return t

    return jax.tree_util.tree_map(conv, tree)


def _t(batch, key, dtype=torch.long):
    return torch.as_tensor(np.asarray(batch[key]), dtype=dtype)


def _real(batch, weight_key):
    """Number of real (unpadded) rows of a framework batch."""
    return int(np.asarray(batch[weight_key]).sum())


def _slice_real(batch, weight_key, *keys):
    """Return the real rows of each requested field (framework batches pad
    to static shape with 0-weight rows — pointwise layout pads the pos and
    neg blocks separately; the reference computes plain means over real rows)."""
    w = np.asarray(batch[weight_key]) > 0
    return [torch.as_tensor(np.asarray(batch[k])[w]) for k in keys]


# ----------------------------------------------------------------- primitives

def bce(logits, labels):
    """nn.BCELoss(sigmoid(x), y) == BCEWithLogits (reference uses the former)."""
    return F.binary_cross_entropy_with_logits(logits, labels.float())


def emb_loss(embeddings, norm=2):
    """recbole EmbLoss: sum_i ||E_i||_p / batch_size (of the last tensor)."""
    total = sum(torch.norm(e, p=norm) for e in embeddings)
    return total / embeddings[-1].shape[0]


def bpr_loss(pos, neg, gamma=1e-10):
    """recbole BPRLoss: -log(gamma + sigmoid(pos - neg)).mean()."""
    return -torch.log(gamma + torch.sigmoid(pos - neg)).mean()


def reg_loss(weights):
    """recbole RegLoss: sum of L2 norms."""
    return sum(torch.norm(w, p=2) for w in weights)


def linear(p, x):
    """Framework linear layout: {'w': [d_in, d_out], 'b': [d_out]}."""
    return x @ p["w"] + p["b"]


def mlp_tanh(layers, x):
    """recbole MLPLayers(activation='tanh'): tanh after EVERY linear."""
    for p in layers:
        x = torch.tanh(linear(p, x))
    return x


def mlp_relu(layers, x):
    for p in layers:
        x = torch.relu(linear(p, x))
    return x


# ------------------------------------------------------------------------ CMF

class CMFOracle:
    """`cmf.py:81-99`: alpha * (BCE_s + lambda*EmbLoss) + (1-alpha) * (BCE_t
    + gamma*EmbLoss) on one shared user/item table pair."""

    def loss(self, tp, batch, m, phase):
        su, si, sl = _slice_real(batch, "source_sample_weight",
                                 m.SOURCE_USER_ID, m.SOURCE_ITEM_ID, m.SOURCE_LABEL)
        tu, ti, tl = _slice_real(batch, "target_sample_weight",
                                 m.TARGET_USER_ID, m.TARGET_ITEM_ID, m.TARGET_LABEL)
        ue, ie = tp["user_embedding"], tp["item_embedding"]
        s_logit = (ue[su] * ie[si]).sum(-1)
        t_logit = (ue[tu] * ie[ti]).sum(-1)
        loss_s = bce(s_logit, sl) + m.lamda * emb_loss([ue[su], ie[si]])
        loss_t = bce(t_logit, tl) + m.gamma * emb_loss([ue[tu], ie[ti]])
        return loss_s * m.alpha + loss_t * (1 - m.alpha)

    def full_sort(self, tp, m, users):
        return tp["user_embedding"][users] @ tp["item_embedding"][: m.target_num_items].T


# ----------------------------------------------------------------------- CLFM

class CLFMOracle:
    """`clfm.py:74-124`: per-domain tables, shared + domain-only user
    projections concatenated, dotted with the item embedding."""

    def _factors(self, tp, user_e, domain):
        parts = []
        if "shared_linear" in tp:
            parts.append(user_e @ tp["shared_linear"])
        key = f"{domain}_only_linear"
        if key in tp:
            parts.append(user_e @ tp[key])
        return torch.cat(parts, dim=-1)

    def _fwd(self, tp, u, i, domain):
        ue = tp[f"{domain}_user_embedding"][u]
        ie = tp[f"{domain}_item_embedding"][i]
        return (self._factors(tp, ue, domain) * ie).sum(-1)

    def loss(self, tp, batch, m, phase):
        su, si, sl = _slice_real(batch, "source_sample_weight",
                                 m.SOURCE_USER_ID, m.SOURCE_ITEM_ID, m.SOURCE_LABEL)
        tu, ti, tl = _slice_real(batch, "target_sample_weight",
                                 m.TARGET_USER_ID, m.TARGET_ITEM_ID, m.TARGET_LABEL)
        loss_s = bce(self._fwd(tp, su, si, "source"), sl) + m.reg_weight * emb_loss(
            [tp["source_user_embedding"][su], tp["source_item_embedding"][si]])
        loss_t = bce(self._fwd(tp, tu, ti, "target"), tl) + m.reg_weight * emb_loss(
            [tp["target_user_embedding"][tu], tp["target_item_embedding"][ti]])
        return loss_s * m.alpha + loss_t * (1 - m.alpha)

    def full_sort(self, tp, m, users):
        f = self._factors(tp, tp["target_user_embedding"][users], "target")
        return f @ tp["target_item_embedding"][: m.target_num_items].T


# ---------------------------------------------------------------------- CoNet

class CoNetOracle:
    """`conet.py:105-203`: twin towers with per-layer cross-stitch on
    overlapped rows (one shared cross matrix per layer, both directions);
    BCE_s + BCE_t + sum of cross-matrix norms (unweighted, `conet.py:198-201`)."""

    def _towers(self, tp, m, user, item):
        src_x = torch.cat([tp["source_user_embedding"][user],
                           tp["source_item_embedding"][item]], dim=-1)
        tgt_x = torch.cat([tp["target_user_embedding"][user],
                           tp["target_item_embedding"][item]], dim=-1)
        if m.mode == "overlap_users":
            ov = (user < m.overlapped_num_users)
        else:
            ov = (item < m.overlapped_num_items)
        ov = ov[:, None].float()
        for s_l, t_l, cross in zip(tp["source_tower"], tp["target_tower"], tp["cross"]):
            s_out = linear(s_l, src_x) + ov * (tgt_x @ cross)
            t_out = linear(t_l, tgt_x) + ov * (src_x @ cross)
            src_x, tgt_x = torch.relu(s_out), torch.relu(t_out)
        return src_x, tgt_x

    def loss(self, tp, batch, m, phase):
        su, si, sl = _slice_real(batch, "source_sample_weight",
                                 m.SOURCE_USER_ID, m.SOURCE_ITEM_ID, m.SOURCE_LABEL)
        tu, ti, tl = _slice_real(batch, "target_sample_weight",
                                 m.TARGET_USER_ID, m.TARGET_ITEM_ID, m.TARGET_LABEL)
        s_h, _ = self._towers(tp, m, su, si)
        _, t_h = self._towers(tp, m, tu, ti)
        s_logit = linear(tp["source_out"], s_h).squeeze(-1)
        t_logit = linear(tp["target_out"], t_h).squeeze(-1)
        return bce(s_logit, sl) + bce(t_logit, tl) + reg_loss(tp["cross"])

    def full_sort(self, tp, m, users):
        item_e = tp["target_item_embedding"][: m.target_num_items]
        user_e = tp["target_user_embedding"][users]
        B, I = user_e.shape[0], item_e.shape[0]
        x = torch.cat([user_e[:, None, :].expand(B, I, -1),
                       item_e[None, :, :].expand(B, I, -1)], dim=-1)
        for layer in tp["target_tower"]:
            x = torch.relu(linear(layer, x))
        return torch.sigmoid(linear(tp["target_out"], x).squeeze(-1))


# ---------------------------------------------------------------------- DTCDR

class DTCDROracle:
    """`dtcdr.py:112-201`: NeuMF or DMF base per domain, overlapped
    embeddings combined by elementwise maximum (effective reference behavior
    — see module docstring for the mirrored DMF fixes)."""

    def _neumf(self, tp, m, u, i, domain):
        user_e = torch.maximum(tp["source_user_embedding"][u],
                               tp["target_user_embedding"][u])
        item_e = torch.maximum(tp["source_item_embedding"][i],
                               tp["target_item_embedding"][i])
        h = mlp_relu(tp[f"{domain}_mlp"], torch.cat([user_e, item_e], dim=-1))
        return linear(tp[f"{domain}_predict"], h).squeeze(-1)

    def _vec(self, hist, ids, length):
        rows = torch.as_tensor(np.asarray(hist)[np.asarray(ids)])
        B, H = rows.shape
        vec = torch.zeros((B, length))
        vec[torch.arange(B)[:, None].expand(B, H).reshape(-1),
            rows.reshape(-1)] = 1.0
        vec[:, 0] = 0.0
        return vec

    def _dmf(self, tp, m, u, i, domain):
        src_u = self._vec(m._s_hist_items, u, m.source_num_items)
        tgt_u = self._vec(m._t_hist_items, u, m.target_num_items)
        user_e = torch.maximum(src_u @ tp["source_user_linear"],
                               tgt_u @ tp["target_user_linear"])
        src_i = self._vec(m._s_hist_users, i, m.source_num_users)
        tgt_i = self._vec(m._t_hist_users, i, m.target_num_users)
        item_e = torch.maximum(src_i @ tp["source_item_linear"],
                               tgt_i @ tp["target_item_linear"])
        uh = mlp_relu(tp[f"{domain}_user_fc"], user_e)
        ih = mlp_relu(tp[f"{domain}_item_fc"], item_e)
        return (uh * ih).sum(-1)

    def loss(self, tp, batch, m, phase):
        su, si, sl = _slice_real(batch, "source_sample_weight",
                                 m.SOURCE_USER_ID, m.SOURCE_ITEM_ID, m.SOURCE_LABEL)
        tu, ti, tl = _slice_real(batch, "target_sample_weight",
                                 m.TARGET_USER_ID, m.TARGET_ITEM_ID, m.TARGET_LABEL)
        fwd = self._neumf if m.base_model == "NeuMF" else self._dmf
        loss_s = bce(fwd(tp, m, su, si, "source"), sl)
        loss_t = bce(fwd(tp, m, tu, ti, "target"), tl)
        return loss_s * m.alpha + loss_t * (1 - m.alpha)

    def full_sort(self, tp, m, users):
        items = torch.arange(m.target_num_items)
        fwd = self._neumf if m.base_model == "NeuMF" else self._dmf
        out = []
        for u in users:
            uu = u.repeat(len(items))
            out.append(torch.sigmoid(fwd(tp, m, uu, items, "target")))
        return torch.stack(out)


# -------------------------------------------------------------------- DeepAPF

class DeepAPFOracle:
    """`deepapf.py:69-149`: share vs domain-specific attention with the
    strict ``id > overlapped_num`` mask and -1e31 fill."""

    def _att(self, tp, mlp, x):
        h = torch.relu(linear(mlp[0], x))
        return h @ mlp[1]["w"]

    def _fwd(self, tp, m, user, item, domain):
        if m.mode == "overlap_users":
            share_e = tp["share_user_embedding"][user]
            only_e = tp[f"{domain}_user_embedding"][user]
            other_e = tp[f"{domain}_item_embedding"][item]
            mask = (user > m.overlapped_num_users)[:, None]
            mlp = tp["user_mlp"]
        else:
            share_e = tp["share_item_embedding"][item]
            only_e = tp[f"{domain}_item_embedding"][item]
            other_e = tp[f"{domain}_user_embedding"][user]
            mask = (item > m.overlapped_num_items)[:, None]
            mlp = tp["item_mlp"]
        a_share = self._att(tp, mlp, share_e * other_e)
        a_only = self._att(tp, mlp, only_e * other_e)
        a_share = a_share.masked_fill(mask, -1e31)
        alpha = F.softmax(torch.cat([a_share, a_only], dim=1), dim=1)
        entity_e = alpha[:, 0:1] * share_e + alpha[:, 1:2] * only_e
        return ((entity_e * other_e) @ tp["predict_layer"]).squeeze(-1)

    def loss(self, tp, batch, m, phase):
        su, si, sl = _slice_real(batch, "source_sample_weight",
                                 m.SOURCE_USER_ID, m.SOURCE_ITEM_ID, m.SOURCE_LABEL)
        tu, ti, tl = _slice_real(batch, "target_sample_weight",
                                 m.TARGET_USER_ID, m.TARGET_ITEM_ID, m.TARGET_LABEL)
        return bce(self._fwd(tp, m, su, si, "source"), sl) + \
            bce(self._fwd(tp, m, tu, ti, "target"), tl)

    def full_sort(self, tp, m, users):
        items = torch.arange(m.target_num_items)
        out = []
        for u in users:
            uu = u.repeat(len(items))
            out.append(torch.sigmoid(self._fwd(tp, m, uu, items, "target")))
        return torch.stack(out)


# --------------------------------------------------------------------- BiTGCF

class BiTGCFOracle:
    """`bitgcf.py:130-250`: LightGCN-ish propagation x + side + x*side per
    domain, lambda + Laplace transfer of overlapped rows, L2-normalized layer
    outputs aggregated by concat/mean; BCE + reg per domain, tuple summed."""

    def __init__(self):
        self._adj = None

    def prepare(self, dataset, m):
        """Build the normalized adjacencies from the dataset exactly as the
        reference does (`bitgcf.py:92-116`) — independent of the framework's
        _norm_adj code path."""
        self._adj, self._deg = {}, {}
        nu, ni = m.total_num_users, m.total_num_items
        for name in ("source", "target"):
            inter = dataset.inter_matrix(form="coo", domain=name).astype(np.float32)
            n = nu + ni
            rows = np.concatenate([inter.row, inter.col + nu])
            cols = np.concatenate([inter.col + nu, inter.row])
            A = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n))
            A.sum_duplicates()
            diag = np.array((A > 0).sum(axis=1)).flatten() + 1e-7
            D = sp.diags(np.power(diag, -0.5).astype(np.float32))
            L = sp.coo_matrix(D @ A @ D)
            self._adj[name] = torch.sparse_coo_tensor(
                torch.as_tensor(np.stack([L.row, L.col])),
                torch.as_tensor(L.data.astype(np.float32)), size=(n, n)).coalesce()
            self._deg[f"{name}_user"] = torch.as_tensor(
                np.asarray(inter.sum(axis=1), dtype=np.float32).reshape(-1, 1))
            self._deg[f"{name}_item"] = torch.as_tensor(
                np.asarray(inter.sum(axis=0), dtype=np.float32).reshape(-1, 1))

    def _transfer(self, m, src, tgt):
        nu = m.total_num_users
        su, si = src[:nu], src[nu:]
        tu, ti = tgt[:nu], tgt[nu:]
        ls, lt = m.lambda_source, m.lambda_target
        su_lam = ls * su + (1 - ls) * tu
        tu_lam = lt * tu + (1 - lt) * su
        si_lam = ls * si + (1 - ls) * ti
        ti_lam = lt * ti + (1 - lt) * si
        u_den = self._deg["source_user"] + self._deg["target_user"] + 1e-7
        u_lap = (self._deg["source_user"] * su + self._deg["target_user"] * tu) / u_den
        i_den = self._deg["source_item"] + self._deg["target_item"] + 1e-7
        i_lap = (self._deg["source_item"] * si + self._deg["target_item"] * ti) / i_den
        n_ou, n_oi = m.overlapped_num_users, m.overlapped_num_items
        su_new = torch.cat([(su_lam[:n_ou] + u_lap[:n_ou]) / 2, su[n_ou:]])
        tu_new = torch.cat([(tu_lam[:n_ou] + u_lap[:n_ou]) / 2, tu[n_ou:]])
        si_new = torch.cat([(si_lam[:n_oi] + i_lap[:n_oi]) / 2, si[n_oi:]])
        ti_new = torch.cat([(ti_lam[:n_oi] + i_lap[:n_oi]) / 2, ti[n_oi:]])
        return torch.cat([su_new, si_new]), torch.cat([tu_new, ti_new])

    def forward(self, tp, m, train=False):
        src = torch.cat([tp["source_user_embedding"], tp["source_item_embedding"]])
        tgt = torch.cat([tp["target_user_embedding"], tp["target_item_embedding"]])
        src_list, tgt_list = [src], [tgt]
        for _ in range(m.n_layers):
            s_side = torch.sparse.mm(self._adj["source"], src)
            t_side = torch.sparse.mm(self._adj["target"], tgt)
            src = src + s_side + src * s_side
            tgt = tgt + t_side + tgt * t_side
            # the reference applies nn.Dropout(drop_rate) on each layer's
            # propagated embeddings during training (`bitgcf.py:134`); its
            # omission here made the round-4 scale oracle train dropout-free
            # while the framework (correctly) trained at drop_rate=0.3 — the
            # mechanism behind the systematic +20% framework advantage
            if train and m.drop_rate > 0:
                src = F.dropout(src, p=m.drop_rate, training=True)
                tgt = F.dropout(tgt, p=m.drop_rate, training=True)
            src, tgt = self._transfer(m, src, tgt)
            src_list.append(F.normalize(src, p=2, dim=1))
            tgt_list.append(F.normalize(tgt, p=2, dim=1))
        if m.connect_way == "concat":
            src_all = torch.cat(src_list, dim=1)
            tgt_all = torch.cat(tgt_list, dim=1)
        else:
            src_all = torch.stack(src_list, dim=1).mean(dim=1)
            tgt_all = torch.stack(tgt_list, dim=1).mean(dim=1)
        nu = m.total_num_users
        return src_all[:nu], src_all[nu:], tgt_all[:nu], tgt_all[nu:]

    def loss(self, tp, batch, m, phase):
        su, si, sl = _slice_real(batch, "source_sample_weight",
                                 m.SOURCE_USER_ID, m.SOURCE_ITEM_ID, m.SOURCE_LABEL)
        tu, ti, tl = _slice_real(batch, "target_sample_weight",
                                 m.TARGET_USER_ID, m.TARGET_ITEM_ID, m.TARGET_LABEL)
        s_u, s_i, t_u, t_i = self.forward(tp, m, train=True)
        s_logit = (s_u[su] * s_i[si]).sum(-1)
        t_logit = (t_u[tu] * t_i[ti]).sum(-1)
        s_loss = bce(s_logit, sl) + m.reg_weight * emb_loss(
            [tp["source_user_embedding"][su], tp["source_item_embedding"][si]])
        t_loss = bce(t_logit, tl) + m.reg_weight * emb_loss(
            [tp["target_user_embedding"][tu], tp["target_item_embedding"][ti]])
        return s_loss + t_loss

    def full_sort(self, tp, m, users):
        _, _, t_u, t_i = self.forward(tp, m)
        return t_u[users] @ t_i[: m.target_num_items].T


# ---------------------------------------------------------------------- EMCDR

class EMCDROracle:
    """`emcdr.py:110-176`: MF (pointwise MSE + EmbLoss) or BPR per domain;
    OVERLAP phase maps source rows -> target rows by MSE over overlapped ids
    (NOT detached — gradients flow into both tables, `emcdr.py:156-168`)."""

    def _map(self, tp, x):
        mp = tp["mapping"]
        if isinstance(mp, list):
            for i, layer in enumerate(mp):
                x = linear(layer, x)
                if i != len(mp) - 1:
                    x = torch.tanh(x)
            return x
        return x @ mp

    def _domain(self, tp, m, batch, prefix, uid, iid, neg, lab, wkey):
        ue_t, ie_t = tp[f"{prefix}_user_embedding"], tp[f"{prefix}_item_embedding"]
        if not m.is_pairwise:
            u, i, l = _slice_real(batch, wkey, uid, iid, lab)
            pred = (ue_t[u] * ie_t[i]).sum(-1)
            base = F.mse_loss(pred, l.float())
        else:
            u, i, ng = _slice_real(batch, wkey, uid, iid, neg)
            pos = (ue_t[u] * ie_t[i]).sum(-1)
            negs = (ue_t[u] * ie_t[ng]).sum(-1)
            base = bpr_loss(pos, negs)
        return base + m.reg_weight * emb_loss([ue_t[u], ie_t[i]])

    def loss(self, tp, batch, m, phase):
        if phase == "SOURCE":
            return self._domain(tp, m, batch, "source", m.SOURCE_USER_ID,
                                m.SOURCE_ITEM_ID, m.SOURCE_NEG_ITEM_ID,
                                m.SOURCE_LABEL, "source_sample_weight")
        if phase == "OVERLAP":
            (idx,) = _slice_real(batch, "overlap_sample_weight", "overlap")
            if m.mode == "overlap_users":
                src_e = tp["source_user_embedding"][idx]
                tgt_e = tp["target_user_embedding"][idx]
            else:
                src_e = tp["source_item_embedding"][idx]
                tgt_e = tp["target_item_embedding"][idx]
            return F.mse_loss(self._map(tp, src_e), tgt_e)
        return self._domain(tp, m, batch, "target", m.TARGET_USER_ID,
                            m.TARGET_ITEM_ID, m.TARGET_NEG_ITEM_ID,
                            m.TARGET_LABEL, "target_sample_weight")

    def full_sort(self, tp, m, users):
        if m.mode == "overlap_users":
            mapped = self._map(tp, tp["source_user_embedding"][users])
            direct = tp["target_user_embedding"][users]
            user_e = torch.where((users < m.overlapped_num_users)[:, None], mapped, direct)
            item_e = tp["target_item_embedding"][: m.target_num_items]
        else:
            user_e = tp["target_user_embedding"][users]
            ov = self._map(tp, tp["source_item_embedding"][: m.overlapped_num_items])
            item_e = torch.cat(
                [ov, tp["target_item_embedding"][m.overlapped_num_items : m.target_num_items]])
        return user_e @ item_e.T


# ---------------------------------------------------------------------- SSCDR

class SSCDROracle:
    """`sscdr.py:119-187`: triplet margin metric learning per domain with the
    squared-length normalize quirk; OVERLAP = supervised MSE + lambda *
    semi-supervised triplet over mapped neighbors (pos/neg come pre-sampled
    in the batch — the framework's host hook and the test feed both sides
    the same draws)."""

    @staticmethod
    def _norm(e):
        l2 = (e ** 2).sum(dim=1, keepdim=True)
        return e / torch.where(l2 > 1, l2, torch.ones_like(l2))

    def __init__(self):
        self.triplet = None

    def _trip(self, m, a, p, n):
        if self.triplet is None:
            self.triplet = torch.nn.TripletMarginLoss(margin=m.margin)
        return self.triplet(a, p, n)

    def loss(self, tp, batch, m, phase):
        if phase == "SOURCE":
            u, p, n = _slice_real(batch, "source_sample_weight", m.SOURCE_USER_ID,
                                  m.SOURCE_ITEM_ID, m.SOURCE_NEG_ITEM_ID)
            return self._trip(m, self._norm(tp["source_user_embedding"][u]),
                              self._norm(tp["source_item_embedding"][p]),
                              self._norm(tp["source_item_embedding"][n]))
        if phase == "OVERLAP":
            idx, pos, neg = _slice_real(batch, "overlap_sample_weight",
                                        "overlap", "overlap_pos", "overlap_neg")
            if m.mode == "overlap_users":
                src_e = tp["source_user_embedding"][idx]
                tgt_e = tp["target_user_embedding"][idx]
                map_pos = mlp_tanh(tp["mapping"], tp["source_item_embedding"][pos])
                map_neg = mlp_tanh(tp["mapping"], tp["source_item_embedding"][neg])
            else:
                src_e = tp["source_item_embedding"][idx]
                tgt_e = tp["target_item_embedding"][idx]
                map_pos = mlp_tanh(tp["mapping"], tp["source_user_embedding"][pos])
                map_neg = mlp_tanh(tp["mapping"], tp["source_user_embedding"][neg])
            loss_s = F.mse_loss(mlp_tanh(tp["mapping"], src_e), tgt_e)
            loss_u = self._trip(m, self._norm(tgt_e), self._norm(map_pos),
                                self._norm(map_neg))
            return loss_s + m.lamda * loss_u
        u, p, n = _slice_real(batch, "target_sample_weight", m.TARGET_USER_ID,
                              m.TARGET_ITEM_ID, m.TARGET_NEG_ITEM_ID)
        return self._trip(m, self._norm(tp["target_user_embedding"][u]),
                          self._norm(tp["target_item_embedding"][p]),
                          self._norm(tp["target_item_embedding"][n]))

    def full_sort(self, tp, m, users):
        if m.mode == "overlap_users":
            mapped = mlp_tanh(tp["mapping"], tp["source_user_embedding"][users])
            direct = tp["target_user_embedding"][users]
            user_e = torch.where((users < m.overlapped_num_users)[:, None], mapped, direct)
            item_e = tp["target_item_embedding"][: m.target_num_items]
        else:
            user_e = tp["target_user_embedding"][users]
            ov = mlp_tanh(tp["mapping"],
                          tp["source_item_embedding"][: m.overlapped_num_items])
            item_e = torch.cat(
                [ov, tp["target_item_embedding"][m.overlapped_num_items : m.target_num_items]])
        ue, ie = self._norm(user_e), self._norm(item_e)
        return -((ue[:, None, :] - ie[None, :, :]) ** 2).sum(-1)


# --------------------------------------------------------------------- DCDCSR

class DCDCSROracle:
    """`dcdcsr.py:119-216`: BPR per domain; BOTH trains the mapping MLP onto
    the benchmark embedding (built at phase entry, `dcdcsr.py:136-159`);
    second TARGET retrains against the frozen affine embedding."""

    @staticmethod
    def _maxmin(e):
        min_ = e.amin(dim=1, keepdim=True)
        max_ = e.amax(dim=1, keepdim=True)
        mean_ = (max_ + min_) / 2
        denom = torch.where(max_ - mean_ == 0, torch.ones_like(mean_), max_ - mean_)
        return (e - mean_) / denom, mean_, max_

    def build_benchmark(self, tp, m):
        """Reference per-unit loop `dcdcsr.py:136-159`, kept as the loop to be
        genuinely independent of the framework's batched top-k rewrite."""
        if m.mode == "overlap_users":
            n_total, n_ov = m.total_num_users, m.overlapped_num_users
            src_overlap = tp["source_user_embedding"][:n_ov].detach()
            tgt = tp["target_user_embedding"].detach()
        else:
            n_total, n_ov = m.total_num_items, m.overlapped_num_items
            src_overlap = tp["source_item_embedding"][:n_ov].detach()
            tgt = tp["target_item_embedding"].detach()
        s_pop = torch.as_tensor(np.asarray(m._source_pop))
        t_pop = torch.as_tensor(np.asarray(m._target_pop))
        bench = torch.empty((n_total, src_overlap.shape[1]))
        for idx in range(n_ov):
            den = s_pop[idx] + t_pop[idx]
            if den == 0:
                den = torch.tensor(1.0)
            a_s = s_pop[idx] / den
            bench[idx] = a_s * tgt[idx] + (1 - a_s) * src_overlap[idx]
        k = min(m.k, n_ov)
        for idx in range(n_ov, n_total):
            sim_i = src_overlap @ tgt[idx]
            sim, index = torch.topk(sim_i, k=k)
            sn = s_pop[index].mean()
            beta = sn / (sn + t_pop[idx])
            sim_e = sim[None, :] @ src_overlap[index]
            ssum = sim.sum() if sim.sum() > 0 else torch.tensor(1.0)
            bench[idx] = (1 - beta) * tgt[idx] + beta * (sim_e.squeeze(0) / ssum)
        return bench

    def build_affine(self, tp, m):
        if m.mode == "overlap_users":
            src = tp["target_user_embedding"][: m.target_num_users]
        else:
            src = tp["target_item_embedding"][: m.target_num_items]
        normal, mean_, max_ = self._maxmin(src)
        return (mlp_tanh(tp["mapping"], normal) * (max_ - mean_) + mean_).detach()

    def _bpr(self, tp, batch, m, user_table, item_table, uid, iid, neg, wkey):
        u, p, n = _slice_real(batch, wkey, uid, iid, neg)
        ue = user_table[u]
        return bpr_loss((ue * item_table[p]).sum(-1), (ue * item_table[n]).sum(-1))

    def loss(self, tp, batch, m, phase, phase_count=1):
        if phase == "SOURCE":
            return self._bpr(tp, batch, m, tp["source_user_embedding"],
                             tp["source_item_embedding"], m.SOURCE_USER_ID,
                             m.SOURCE_ITEM_ID, m.SOURCE_NEG_ITEM_ID,
                             "source_sample_weight")
        if phase == "BOTH":
            idx = torch.as_tensor(np.asarray(batch["map_sample_idx"]))
            table = tp["target_user_embedding"] if m.mode == "overlap_users" \
                else tp["target_item_embedding"]
            unit_n, _, _ = self._maxmin(table[idx])
            mapped = mlp_tanh(tp["mapping"], unit_n)
            bench_n, _, _ = self._maxmin(tp["benchmark_embedding"][idx])
            return F.mse_loss(mapped, bench_n)
        if phase == "TARGET" and phase_count == 2:
            if m.mode == "overlap_users":
                return self._bpr(tp, batch, m, tp["affine_embedding"],
                                 tp["target_item_embedding"], m.TARGET_USER_ID,
                                 m.TARGET_ITEM_ID, m.TARGET_NEG_ITEM_ID,
                                 "target_sample_weight")
            return self._bpr(tp, batch, m, tp["target_user_embedding"],
                             tp["affine_embedding"], m.TARGET_USER_ID,
                             m.TARGET_ITEM_ID, m.TARGET_NEG_ITEM_ID,
                             "target_sample_weight")
        return self._bpr(tp, batch, m, tp["target_user_embedding"],
                         tp["target_item_embedding"], m.TARGET_USER_ID,
                         m.TARGET_ITEM_ID, m.TARGET_NEG_ITEM_ID,
                         "target_sample_weight")

    def full_sort(self, tp, m, users, phase="TARGET", phase_count=2):
        use_affine = (phase == "TARGET" and phase_count >= 2) or phase in ("OVERLAP", "BOTH")
        if use_affine and m.mode == "overlap_users":
            return tp["affine_embedding"][users] @ \
                tp["target_item_embedding"][: m.target_num_items].T
        if use_affine and m.mode == "overlap_items":
            return tp["target_user_embedding"][users] @ tp["affine_embedding"].T
        return tp["target_user_embedding"][users] @ \
            tp["target_item_embedding"][: m.target_num_items].T


# ----------------------------------------------------------------------- NATR

class NATROracle:
    """`natr.py:104-172`: phase-1 source MF (BCE); phase-2 item-level
    attention over the entity's source-embedding history plus a domain-level
    exp-gate, with RegLoss over 5 weight groups."""

    def loss(self, tp, batch, m, phase):
        if phase == "SOURCE":
            u, i, l = _slice_real(batch, "source_sample_weight", m.SOURCE_USER_ID,
                                  m.SOURCE_ITEM_ID, m.SOURCE_LABEL)
            logit = (tp["source_user_embedding"][u] * tp["source_item_embedding"][i]).sum(-1)
            return bce(logit, l)
        u, i, l = _slice_real(batch, "target_sample_weight", m.TARGET_USER_ID,
                              m.TARGET_ITEM_ID, m.TARGET_LABEL)
        logit = self._phase2_logit(tp, m, u, i)
        rec = bce(logit, l)
        reg = reg_loss([tp["target_user_embedding"], tp["target_item_embedding"],
                        tp["transfer"]["w"], tp["unit_attention"]["w"],
                        tp["domain_attention"]["w"]])
        return rec + m.reg_weight * reg

    def _phase2_logit(self, tp, m, user, item):
        user_e = tp["target_user_embedding"][user]
        item_e = tp["target_item_embedding"][item]
        if m.mode == "overlap_items":
            anchor, pu, qi = user, user_e, item_e
            hist_table = tp["source_item_embedding"]
        else:
            anchor, pu, qi = item, item_e, user_e
            hist_table = tp["source_user_embedding"]
        hist = torch.as_tensor(np.asarray(m._history))[anchor]
        mask = torch.as_tensor(np.asarray(m._hist_mask))[anchor]
        hist_e = linear(tp["transfer"], hist_table[hist])
        att = torch.relu(pu[:, None, :] * hist_e) @ tp["unit_attention"]["w"] \
            + tp["unit_attention"]["b"]
        att = att.squeeze(-1) + torch.where(mask, 0.0, -10000.0)
        att = F.softmax(att, dim=1)
        su = (att[:, None, :] @ hist_e).squeeze(1)
        b_s = linear(tp["domain_attention"], torch.relu(su * qi))
        b_p = linear(tp["domain_attention"], torch.relu(pu * qi))
        beta_s = torch.exp(b_s) / (torch.exp(b_s) + torch.exp(b_p))
        zu = beta_s * su + (1 - beta_s) * pu
        return (zu * qi).sum(-1)

    def full_sort(self, tp, m, users):
        items = torch.arange(m.target_num_items)
        out = []
        for u in users:
            uu = u.repeat(len(items))
            out.append(torch.sigmoid(self._phase2_logit(tp, m, uu, items)))
        return torch.stack(out)


ORACLES = {
    "CMF": CMFOracle,
    "CLFM": CLFMOracle,
    "CoNet": CoNetOracle,
    "DTCDR": DTCDROracle,
    "DeepAPF": DeepAPFOracle,
    "BiTGCF": BiTGCFOracle,
    "EMCDR": EMCDROracle,
    "SSCDR": SSCDROracle,
    "DCDCSR": DCDCSROracle,
    "NATR": NATROracle,
}
