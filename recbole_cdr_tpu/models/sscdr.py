"""SSCDR — Semi-Supervised Cross-Domain Recommendation for cold-start users
(Kang et al., CIKM 2019).

Metric-space variant: triplet margin loss per domain; the OVERLAP (mapping)
phase combines a supervised MSE on overlapped entities with a semi-supervised
triplet over mapped source-space neighbors (interacted vs non-interacted),
sampled host-side per batch. Scoring is negative squared euclidean distance.

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/sscdr.py:23-259`
(including the reference's squared-length "normalize" quirk at
`sscdr.py:119-124`). The per-row python rejection sampler (`sscdr.py:89-117`)
is replaced by a vectorized numpy sampler with identical semantics, invoked
via the ``augment_batch`` host hook.
"""

import numpy as np

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    init_embedding,
    init_mlp,
    weighted_mean,
)
from recbole_cdr_tpu.utils.enums import InputType


class SSCDR(CrossDomainRecommender):
    input_type = InputType.PAIRWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        assert self.overlapped_num_items == 1 or self.overlapped_num_users == 1, (
            "SSCDR model only support user overlapped or item overlapped dataset! "
        )
        if self.overlapped_num_users > 1:
            self.mode = "overlap_users"
        elif self.overlapped_num_items > 1:
            self.mode = "overlap_items"
        else:
            self.mode = "non_overlap"

        self.embedding_size = config["embedding_size"]
        self.lamda = float(config["lambda"])
        self.margin = float(config["margin"])
        self.mlp_hidden_size = list(config["mlp_hidden_size"])

        # source-domain interacted sets in CSR form for the semi-supervised
        # neighbor sampling (reference `sscdr.py:74-87`)
        src = dataset.source_domain_dataset
        uids = src.arrays[src.uid_field]
        iids = src.arrays[src.iid_field]
        if self.mode == "overlap_users":
            keys, vals = uids, iids
            n_keys = self.total_num_users
            self._candidates = np.concatenate(
                [
                    np.arange(self.overlapped_num_items),
                    np.arange(self.target_num_items, self.total_num_items),
                ]
            )
        else:
            keys, vals = iids, uids
            n_keys = self.total_num_items
            self._candidates = np.concatenate(
                [
                    np.arange(self.overlapped_num_users),
                    np.arange(self.target_num_users, self.total_num_users),
                ]
            )
        # lexsort by (key, val): vals are sorted within each key's slice, so
        # the composite key*V+val array is globally sorted — membership of a
        # (key, draw) pair is ONE vectorized searchsorted over the batch
        order = np.lexsort((vals, keys))
        self._inter_keys_sorted = keys[order]
        self._inter_vals_sorted = vals[order]
        counts = np.bincount(keys, minlength=n_keys)
        self._ptr = np.concatenate([[0], np.cumsum(counts)])
        self._val_space = np.int64(
            self.total_num_items if self.mode == "overlap_users" else self.total_num_users
        )
        self._inter_comp = (
            self._inter_keys_sorted.astype(np.int64) * self._val_space
            + self._inter_vals_sorted
        )
        self._rng = np.random.default_rng(config["seed"] or 0)

    def init_params(self, rng):
        keys = jax.random.split(rng, 5)
        D = self.embedding_size
        p = {
            "source_user_embedding": init_embedding(keys[0], self.total_num_users, D),
            "source_item_embedding": init_embedding(keys[1], self.total_num_items, D),
            "target_user_embedding": init_embedding(keys[2], self.total_num_users, D),
            "target_item_embedding": init_embedding(keys[3], self.total_num_items, D),
            "mapping": init_mlp(keys[4], [D] + self.mlp_hidden_size + [D]),
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

    # --------------------------------------------------------- host sampling

    def needs_host_augment(self, phase):
        return phase == "OVERLAP"

    def augment_batch(self, batch, phase):
        """Semi-supervised neighbor sampling, vectorized over the whole batch.

        Semantics match the reference's per-row loop (`sscdr.py:89-117`):
        pos = uniform draw from the entity's interacted set (0 when empty);
        neg = uniform draw from candidates \\ interacted — realized as batched
        rejection rounds (a rejected round leaves the conditional law uniform
        over the complement) with an exact complement-sample fallback for
        pathological rows, so the distribution is exactly the reference's.
        Rows with an empty interacted set reject only a draw of 0 (the
        reference substitutes ``[0]`` for the empty set)."""
        if phase != "OVERLAP":
            return batch
        ids = np.asarray(batch["overlap"], dtype=np.int64)
        B = len(ids)
        lo = self._ptr[ids]
        cnt = self._ptr[ids + 1] - lo

        n_inter = len(self._inter_vals_sorted)
        if n_inter:
            off = (self._rng.random(B) * np.maximum(cnt, 1)).astype(np.int64)
            safe = np.minimum(np.where(cnt > 0, lo + off, 0), n_inter - 1)
            pos = np.where(cnt > 0, self._inter_vals_sorted[safe], 0)
        else:
            pos = np.zeros(B, dtype=np.int64)

        neg = np.zeros(B, dtype=np.int64)
        pending = np.arange(B)
        comp_base = ids * self._val_space
        n_cand = len(self._candidates)
        for _ in range(64):
            if not len(pending):
                break
            draw = self._candidates[self._rng.integers(0, n_cand, len(pending))]
            comp = comp_base[pending] + draw
            if n_inter:
                loc = np.minimum(np.searchsorted(self._inter_comp, comp), n_inter - 1)
                hit = self._inter_comp[loc] == comp
            else:
                hit = np.zeros(len(pending), dtype=bool)
            hit |= (cnt[pending] == 0) & (draw == 0)
            ok = ~hit
            neg[pending[ok]] = draw[ok]
            pending = pending[hit]
        for k in pending:  # exact complement for rows that never drew clean
            i = ids[k]
            interacted = self._inter_vals_sorted[self._ptr[i] : self._ptr[i + 1]]
            if len(interacted) == 0:
                interacted = np.array([0])
            pool = np.setdiff1d(self._candidates, interacted)
            neg[k] = self._rng.choice(pool)

        batch = dict(batch)
        batch["overlap_pos"] = pos
        batch["overlap_neg"] = neg
        return batch

    # ------------------------------------------------------------ math parts

    @staticmethod
    def _normalize(e):
        """Reference quirk: divide by SQUARED length when > 1 (`sscdr.py:119-124`)."""
        length2 = jnp.sum(e**2, axis=-1, keepdims=True)
        return e / jnp.where(length2 > 1, length2, 1.0)

    @staticmethod
    def _dist2(a, b):
        return jnp.sum((a - b) ** 2, axis=-1)

    def _triplet(self, anchor, pos, neg, weight):
        """torch TripletMarginLoss(margin, p=2): euclidean (non-squared) distances."""
        d_pos = jnp.sqrt(self._dist2(anchor, pos) + 1e-12)
        d_neg = jnp.sqrt(self._dist2(anchor, neg) + 1e-12)
        return weighted_mean(jnp.maximum(d_pos - d_neg + self.margin, 0.0), weight)

    def _map(self, params, x):
        layers = params["mapping"]
        # recbole MLPLayers(activation='tanh'): tanh after every layer
        for layer in layers:
            x = jnp.tanh(x @ layer["w"] + layer["b"])
        return x

    # ----------------------------------------------------------------- losses

    def trainable_predicate(self, phase: str):
        """Params the phase's loss reaches (torch advances Adam state only
        for non-None grads; see EMCDR.trainable_predicate). OVERLAP's
        semi-supervised triplet maps sampled SOURCE neighbors, so the
        cross-entity source table is live there too."""
        if phase == "SOURCE":
            live = {"source_user_embedding", "source_item_embedding"}
        elif phase == "TARGET":
            live = {"target_user_embedding", "target_item_embedding"}
        elif self.mode == "overlap_users":
            live = {"mapping", "source_user_embedding", "target_user_embedding",
                    "source_item_embedding"}
        else:
            live = {"mapping", "source_item_embedding", "target_item_embedding",
                    "source_user_embedding"}
        return lambda name: name in live

    def sparse_spec(self, phase: str):
        """SOURCE/TARGET triplet phases touch tables only through batch ids.
        OVERLAP runs on the host path (semi-supervised neighbor augment) and
        keeps the dense optimizer."""
        if phase == "SOURCE":
            return {"source_user_embedding": [self.SOURCE_USER_ID],
                    "source_item_embedding": [self.SOURCE_ITEM_ID,
                                              self.SOURCE_NEG_ITEM_ID]}
        if phase == "TARGET":
            return {"target_user_embedding": [self.TARGET_USER_ID],
                    "target_item_embedding": [self.TARGET_ITEM_ID,
                                              self.TARGET_NEG_ITEM_ID]}
        return None

    def loss_fn(self, phase: str):
        if phase == "SOURCE":
            def loss(params, batch, rng=None):
                u = batch[self.SOURCE_USER_ID]
                pos = batch[self.SOURCE_ITEM_ID]
                neg = batch[self.SOURCE_NEG_ITEM_ID]
                w = batch["source_sample_weight"]
                ue = self._normalize(params["source_user_embedding"][u])
                pe = self._normalize(params["source_item_embedding"][pos])
                ne = self._normalize(params["source_item_embedding"][neg])
                return self._triplet(ue, pe, ne, w)
            return loss

        if phase == "OVERLAP":
            def loss(params, batch, rng=None):
                idx = batch["overlap"]
                w = batch["overlap_sample_weight"]
                pos = batch["overlap_pos"]
                neg = batch["overlap_neg"]
                if self.mode == "overlap_users":
                    src_e = params["source_user_embedding"][idx]
                    tgt_e = params["target_user_embedding"][idx]
                    map_pos = self._map(params, params["source_item_embedding"][pos])
                    map_neg = self._map(params, params["source_item_embedding"][neg])
                else:
                    src_e = params["source_item_embedding"][idx]
                    tgt_e = params["target_item_embedding"][idx]
                    map_pos = self._map(params, params["source_user_embedding"][pos])
                    map_neg = self._map(params, params["source_user_embedding"][neg])
                map_e = self._map(params, src_e)
                loss_s = weighted_mean(jnp.mean((map_e - tgt_e) ** 2, axis=-1), w)
                loss_u = self._triplet(
                    self._normalize(tgt_e), self._normalize(map_pos), self._normalize(map_neg), w
                )
                return loss_s + self.lamda * loss_u
            return loss

        def loss(params, batch, rng=None):
            u = batch[self.TARGET_USER_ID]
            pos = batch[self.TARGET_ITEM_ID]
            neg = batch[self.TARGET_NEG_ITEM_ID]
            w = batch["target_sample_weight"]
            ue = self._normalize(params["target_user_embedding"][u])
            pe = self._normalize(params["target_item_embedding"][pos])
            ne = self._normalize(params["target_item_embedding"][neg])
            return self._triplet(ue, pe, ne, w)
        return loss

    # ---------------------------------------------------------------- scoring

    def _mapped_user_e(self, params, user):
        mapped = self._map(params, params["source_user_embedding"][user])
        direct = params["target_user_embedding"][user]
        return jnp.where((user < self.overlapped_num_users)[:, None], mapped, direct)

    def predict_fn(self):
        phase = self.phase

        def predict(params, batch):
            if phase == "SOURCE":
                ue = self._normalize(params["source_user_embedding"][batch[self.SOURCE_USER_ID]])
                ie = self._normalize(params["source_item_embedding"][batch[self.SOURCE_ITEM_ID]])
                return -self._dist2(ue, ie)
            if phase == "TARGET":
                ue = self._normalize(params["target_user_embedding"][batch[self.TARGET_USER_ID]])
                ie = self._normalize(params["target_item_embedding"][batch[self.TARGET_ITEM_ID]])
                return -self._dist2(ue, ie)
            user = batch[self.TARGET_USER_ID]
            item = batch[self.TARGET_ITEM_ID]
            if self.mode == "overlap_users":
                ue = self._mapped_user_e(params, user)
                ie = params["target_item_embedding"][item]
            else:
                ue = params["target_user_embedding"][user]
                mapped = self._map(params, params["source_item_embedding"][item])
                ie = jnp.where(
                    (item < self.overlapped_num_items)[:, None],
                    mapped,
                    params["target_item_embedding"][item],
                )
            return -self._dist2(self._normalize(ue), self._normalize(ie))

        return predict

    def full_sort_fn(self, phase: str = "TARGET"):
        def scores(user_e, all_item_e):
            # -||u - i||^2 expanded as matmul (`sscdr.py:254-259`)
            dist = (
                -2.0 * (user_e @ all_item_e.T)
                + jnp.sum(user_e**2, axis=-1, keepdims=True)
                + jnp.sum(all_item_e**2, axis=-1)[None, :]
            )
            return -dist

        if phase == "SOURCE":
            def full_sort(params, users):
                user_e = self._normalize(params["source_user_embedding"][users])
                all_item_e = self._normalize(
                    jnp.concatenate(
                        [
                            params["source_item_embedding"][: self.overlapped_num_items],
                            params["source_item_embedding"][self.target_num_items :],
                        ],
                        axis=0,
                    )
                )
                return scores(user_e, all_item_e)
            return full_sort

        if phase == "TARGET":
            def full_sort(params, users):
                user_e = self._normalize(params["target_user_embedding"][users])
                all_item_e = self._normalize(
                    params["target_item_embedding"][: self.target_num_items]
                )
                return scores(user_e, all_item_e)
            return full_sort

        def full_sort(params, users):
            if self.mode == "overlap_users":
                user_e = self._mapped_user_e(params, users)
                all_item_e = params["target_item_embedding"][: self.target_num_items]
            else:
                user_e = params["target_user_embedding"][users]
                overlap_item_e = self._map(
                    params, params["source_item_embedding"][: self.overlapped_num_items]
                )
                target_item_e = params["target_item_embedding"][
                    self.overlapped_num_items : self.target_num_items
                ]
                all_item_e = jnp.concatenate([overlap_item_e, target_item_e], axis=0)
            return scores(self._normalize(user_e), self._normalize(all_item_e))

        return full_sort
