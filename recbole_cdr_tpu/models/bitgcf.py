"""BiTGCF — Bi-directional Transfer Graph Collaborative Filtering
(Liu et al., CIKM 2020).

LightGCN-style propagation per domain on the symmetric-normalized bipartite
adjacency, with a per-layer bi-directional transfer: lambda-blend plus
degree-(Laplace)-weighted blend of the overlapped rows. Layer outputs are
L2-normalized and aggregated by concat or mean. Joint BCE + EmbLoss on the
ego embeddings; the per-loss tuple of the reference is summed (recbole's
trainer summed tuples, SURVEY §2.2).

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/bitgcf.py:25-282`.
TPU redesign: adjacency as a BCOO sparse matmul inside the jitted step; eval
embeddings cached per evaluate() call instead of the reference's
``other_parameter`` storage (`bitgcf.py:274-282`).
"""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bce_loss,
    emb_loss,
    init_embedding,
)
from recbole_cdr_tpu.utils.enums import InputType
from recbole_cdr_tpu.utils.precision import cast_floats, resolve_compute_dtype


def _norm_adj(interaction_coo, n_users, n_items):
    """D^-1/2 (A) D^-1/2 over the bipartite graph (reference `bitgcf.py:92-116`)."""
    n = n_users + n_items
    rows = np.concatenate([interaction_coo.row, interaction_coo.col + n_users])
    cols = np.concatenate([interaction_coo.col + n_users, interaction_coo.row])
    data = np.ones(len(rows), dtype=np.float32)
    A = sp.coo_matrix((data, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    deg = np.asarray((A > 0).sum(axis=1)).flatten() + 1e-7
    d_inv_sqrt = np.power(deg, -0.5)
    D = sp.diags(d_inv_sqrt)
    L = sp.coo_matrix(D @ A @ D)
    return L


class BiTGCF(CrossDomainRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.latent_dim = config["embedding_size"]
        self.n_layers = config["n_layers"]
        self.reg_weight = float(config["reg_weight"])
        self.lambda_source = float(config["lambda_source"])
        self.lambda_target = float(config["lambda_target"])
        self.drop_rate = float(config["drop_rate"])
        self.connect_way = config["connect_way"]

        # adjacency + degree buffers live in the compute dtype so the whole
        # propagation chain (the dominant HBM traffic) runs bf16 when asked;
        # the trainer's loss wrapper casts the params, this casts the buffers
        self._cdtype = resolve_compute_dtype(config)
        src_inter = dataset.inter_matrix(form="coo", domain="source").astype(np.float32)
        tgt_inter = dataset.inter_matrix(form="coo", domain="target").astype(np.float32)
        nu, ni = self.total_num_users, self.total_num_items
        sL = _norm_adj(src_inter, nu, ni)
        tL = _norm_adj(tgt_inter, nu, ni)
        self.source_adj = jsparse.BCOO(
            (jnp.asarray(sL.data, self._cdtype),
             jnp.asarray(np.stack([sL.row, sL.col], axis=1))),
            shape=(nu + ni, nu + ni),
        )
        self.target_adj = jsparse.BCOO(
            (jnp.asarray(tL.data, self._cdtype),
             jnp.asarray(np.stack([tL.row, tL.col], axis=1))),
            shape=(nu + ni, nu + ni),
        )
        self.source_user_deg = jnp.asarray(
            np.asarray(src_inter.sum(axis=1)).reshape(-1, 1), self._cdtype)
        self.target_user_deg = jnp.asarray(
            np.asarray(tgt_inter.sum(axis=1)).reshape(-1, 1), self._cdtype)
        self.source_item_deg = jnp.asarray(
            np.asarray(src_inter.sum(axis=0)).reshape(-1, 1), self._cdtype)
        self.target_item_deg = jnp.asarray(
            np.asarray(tgt_inter.sum(axis=0)).reshape(-1, 1), self._cdtype)

        # (params_version, (user_all, item_all)) eval cache — keyed on the
        # trainer-bumped generation counter (``base.notify_params_updated``),
        # NOT id(params): CPython recycles ids, which can silently serve a
        # stale propagated-embedding cache for a different params pytree
        self._restore = None

    def init_params(self, rng):
        keys = jax.random.split(rng, 4)
        p = {
            "source_user_embedding": init_embedding(keys[0], self.total_num_users, self.latent_dim),
            "target_user_embedding": init_embedding(keys[1], self.total_num_users, self.latent_dim),
            "source_item_embedding": init_embedding(keys[2], self.total_num_items, self.latent_dim),
            "target_item_embedding": init_embedding(keys[3], self.total_num_items, self.latent_dim),
        }
        p["source_user_embedding"] = (
            p["source_user_embedding"].at[self.overlapped_num_users : self.target_num_users].set(0.0)
        )
        p["source_item_embedding"] = (
            p["source_item_embedding"].at[self.overlapped_num_items : self.target_num_items].set(0.0)
        )
        p["target_user_embedding"] = p["target_user_embedding"].at[self.target_num_users :].set(0.0)
        p["target_item_embedding"] = p["target_item_embedding"].at[self.target_num_items :].set(0.0)
        return p

    # ------------------------------------------------------------ propagation

    def _graph_layer(self, adj, x, rng, train):
        side = adj @ x
        new = x + side + x * side
        if train and self.drop_rate > 0 and rng is not None:
            keep = 1.0 - self.drop_rate
            mask = jax.random.bernoulli(rng, keep, new.shape)
            new = jnp.where(mask, new / keep, 0.0)
        return new

    def _transfer_layer(self, src_all, tgt_all):
        nu = self.total_num_users
        su, si = src_all[:nu], src_all[nu:]
        tu, ti = tgt_all[:nu], tgt_all[nu:]

        su_lam = self.lambda_source * su + (1 - self.lambda_source) * tu
        tu_lam = self.lambda_target * tu + (1 - self.lambda_target) * su
        si_lam = self.lambda_source * si + (1 - self.lambda_source) * ti
        ti_lam = self.lambda_target * ti + (1 - self.lambda_target) * si

        user_lap_den = self.source_user_deg + self.target_user_deg + 1e-7
        u_lap = (self.source_user_deg * su + self.target_user_deg * tu) / user_lap_den
        item_lap_den = self.source_item_deg + self.target_item_deg + 1e-7
        i_lap = (self.source_item_deg * si + self.target_item_deg * ti) / item_lap_den

        n_ou, n_oi = self.overlapped_num_users, self.overlapped_num_items
        su_new = jnp.concatenate([(su_lam[:n_ou] + u_lap[:n_ou]) / 2, su[n_ou:]], axis=0)
        tu_new = jnp.concatenate([(tu_lam[:n_ou] + u_lap[:n_ou]) / 2, tu[n_ou:]], axis=0)
        si_new = jnp.concatenate([(si_lam[:n_oi] + i_lap[:n_oi]) / 2, si[n_oi:]], axis=0)
        ti_new = jnp.concatenate([(ti_lam[:n_oi] + i_lap[:n_oi]) / 2, ti[n_oi:]], axis=0)

        return (
            jnp.concatenate([su_new, si_new], axis=0),
            jnp.concatenate([tu_new, ti_new], axis=0),
        )

    def _forward(self, params, rng=None, train=False):
        src = jnp.concatenate(
            [params["source_user_embedding"], params["source_item_embedding"]], axis=0
        )
        tgt = jnp.concatenate(
            [params["target_user_embedding"], params["target_item_embedding"]], axis=0
        )
        src_list, tgt_list = [src], [tgt]
        for layer in range(self.n_layers):
            r1 = r2 = None
            if rng is not None and train:
                rng, r1, r2 = jax.random.split(rng, 3)
            src = self._graph_layer(self.source_adj, src, r1, train)
            tgt = self._graph_layer(self.target_adj, tgt, r2, train)
            src, tgt = self._transfer_layer(src, tgt)
            # zero-safe L2 normalize: norm() has a NaN VJP at zero rows (dead
            # zero-degree nodes in the blanked table sections); clamping the
            # SQUARED norm keeps the gradient exactly zero there instead —
            # otherwise a configured clip_grad_norm would NaN the global norm
            src_list.append(src * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(src * src, axis=1, keepdims=True), 1e-24)))
            tgt_list.append(tgt * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(tgt * tgt, axis=1, keepdims=True), 1e-24)))

        if self.connect_way == "concat":
            src_all = jnp.concatenate(src_list, axis=1)
            tgt_all = jnp.concatenate(tgt_list, axis=1)
        else:  # mean
            src_all = jnp.mean(jnp.stack(src_list, axis=1), axis=1)
            tgt_all = jnp.mean(jnp.stack(tgt_list, axis=1), axis=1)

        nu = self.total_num_users
        return src_all[:nu], src_all[nu:], tgt_all[:nu], tgt_all[nu:]

    # ----------------------------------------------------------------- losses

    def loss_fn(self, phase: str):
        def loss(params, batch, rng=None):
            su, si = batch[self.SOURCE_USER_ID], batch[self.SOURCE_ITEM_ID]
            tu, ti = batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID]
            sl, tl = batch[self.SOURCE_LABEL], batch[self.TARGET_LABEL]
            sw, tw = batch["source_sample_weight"], batch["target_sample_weight"]

            s_user_all, s_item_all, t_user_all, t_item_all = self._forward(
                params, rng, train=True
            )
            s_logit = jnp.sum(s_user_all[su] * s_item_all[si], axis=-1)
            t_logit = jnp.sum(t_user_all[tu] * t_item_all[ti], axis=-1)

            s_loss = bce_loss(s_logit, sl, sw) + self.reg_weight * emb_loss(
                [params["source_user_embedding"][su], params["source_item_embedding"][si]], sw
            )
            t_loss = bce_loss(t_logit, tl, tw) + self.reg_weight * emb_loss(
                [params["target_user_embedding"][tu], params["target_item_embedding"][ti]], tw
            )
            return s_loss + t_loss

        return loss

    # ---------------------------------------------------------------- scoring

    def _eval_embeddings(self, params):
        version = self.params_version
        if self._restore is None or self._restore[0] != version:
            if not hasattr(self, "_jit_forward"):
                # compute-dtype cast happens INSIDE the jitted forward (this
                # fn is host-cached, so a host-side wrapper would re-cast the
                # full tables on every eval batch)
                self._jit_forward = jax.jit(
                    lambda p: self._forward(
                        cast_floats(p, self._cdtype), None, train=False
                    )
                )
            _, _, t_user_all, t_item_all = self._jit_forward(params)
            self._restore = (version, (t_user_all, t_item_all))
        return self._restore[1]

    def predict_fn(self):
        def predict(params, batch):
            t_user_all, t_item_all = self._eval_embeddings(params)
            u = batch[self.TARGET_USER_ID]
            i = batch[self.TARGET_ITEM_ID]
            return jnp.sum(t_user_all[u] * t_item_all[i], axis=-1)

        predict._no_jit = True  # host-side cache of propagated embeddings
        return predict

    def full_sort_fn(self, phase: str = "TARGET"):
        n_target = self.target_num_items

        def full_sort(params, users):
            t_user_all, t_item_all = self._eval_embeddings(params)
            return t_user_all[users] @ t_item_all[:n_target].T

        full_sort._no_jit = True  # host-side cache of propagated embeddings
        return full_sort

    def full_sort_factors(self, phase: str = "TARGET"):
        """Dot-product factor form over the CACHED propagated embeddings
        (host-keyed on params_version, hence _no_jit): enables the streaming
        tiled top-k for large item spaces without the [B, items] score
        matrix."""
        n_target = self.target_num_items

        def factors(params, users):
            t_user_all, t_item_all = self._eval_embeddings(params)
            return t_user_all[users], t_item_all[:n_target]

        factors._no_jit = True
        return factors
