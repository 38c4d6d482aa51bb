"""NATR — cross-domain recommendation without sharing user-relevant data
(Gao et al., WWW 2019).

Phase 1 (SOURCE): plain MF on the source domain. Phase 2 (TARGET): source
tables freeze; target prediction attends over the entity's history of source
embeddings — item-level attention plus a domain-level attention gate blending
the attended source representation with the target embedding.

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/natr.py:23-191`
(histories truncated to ``max_inter_length`` and built from the full target
interactions, as the reference does at model-construction time). The
source-table freeze (`natr.py:80-84`) is an optimizer mask here instead of
``requires_grad`` toggling. No full-sort method — blocked predict fallback.
"""

import numpy as np

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bce_loss,
    init_embedding,
    init_linear,
    reg_loss,
)
from recbole_cdr_tpu.utils.enums import InputType


class NATR(CrossDomainRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        assert self.overlapped_num_items == 1 or self.overlapped_num_users == 1, (
            "NATR model only support user overlapped or item overlapped dataset! "
        )
        if self.overlapped_num_users > 1:
            self.mode = "overlap_users"
        elif self.overlapped_num_items > 1:
            self.mode = "overlap_items"
        else:
            self.mode = "non_overlap"
        self.phase = None

        self.source_embedding_size = config["source_embedding_size"]
        self.target_embedding_size = config["target_embedding_size"]
        self.reg_weight = float(config["reg_weight"])
        self.max_inter_length = config["max_inter_length"]

        if self.mode == "overlap_users":
            hist, _, lens = dataset.history_user_matrix(domain="target")
        else:
            hist, _, lens = dataset.history_item_matrix(domain="target")
        hist = hist[:, : self.max_inter_length]
        self._history = jnp.asarray(hist)
        lens = np.minimum(lens, hist.shape[1])
        self._hist_mask = jnp.asarray(
            np.arange(hist.shape[1])[None, :] < lens[:, None]
        )

    def init_params(self, rng):
        keys = jax.random.split(rng, 7)
        Ds, Dt = self.source_embedding_size, self.target_embedding_size
        return {
            "source_user_embedding": init_embedding(keys[0], self.total_num_users, Ds),
            "source_item_embedding": init_embedding(keys[1], self.total_num_items, Ds),
            "target_user_embedding": init_embedding(keys[2], self.total_num_users, Dt),
            "target_item_embedding": init_embedding(keys[3], self.total_num_items, Dt),
            "transfer": init_linear(keys[4], Ds, Dt),
            "unit_attention": init_linear(keys[5], Dt, 1),
            "domain_attention": init_linear(keys[6], Dt, 1),
        }

    def trainable_predicate(self, phase):
        """Params the phase's loss reaches (torch advances Adam state only
        for non-None grads; see EMCDR.trainable_predicate)."""
        if phase == "TARGET":
            frozen = {"source_user_embedding", "source_item_embedding"}
            return lambda name: name not in frozen
        live = {"source_user_embedding", "source_item_embedding"}
        return lambda name: name in live

    def sparse_spec(self, phase):
        """Only the SOURCE MF phase touches tables purely through batch ids;
        TARGET's RegLoss reads the full tables (reference `natr.py:168-171`),
        so it keeps the dense optimizer."""
        if phase == "SOURCE":
            return {"source_user_embedding": [self.SOURCE_USER_ID],
                    "source_item_embedding": [self.SOURCE_ITEM_ID]}
        return None

    # ----------------------------------------------------------------- parts

    def _phase1_logit(self, params, user, item):
        return jnp.sum(
            params["source_user_embedding"][user] * params["source_item_embedding"][item], axis=-1
        )

    def _phase2_logit(self, params, user, item):
        user_e = params["target_user_embedding"][user]
        item_e = params["target_item_embedding"][item]
        if self.mode == "overlap_items":
            anchor_ids, pu, qi = user, user_e, item_e
            hist_table = params["source_item_embedding"]
        else:
            anchor_ids, pu, qi = item, item_e, user_e
            hist_table = params["source_user_embedding"]

        hist = self._history[anchor_ids]                       # [B, H]
        mask = self._hist_mask[anchor_ids]                     # [B, H]
        hist_e = hist_table[hist]                              # [B, H, Ds]
        t = params["transfer"]
        hist_e = hist_e @ t["w"] + t["b"]                      # [B, H, Dt]

        ua = params["unit_attention"]
        att = jax.nn.relu(pu[:, None, :] * hist_e) @ ua["w"] + ua["b"]  # [B, H, 1]
        att = att.squeeze(-1) + jnp.where(mask, 0.0, -10000.0)
        att = jax.nn.softmax(att, axis=1)
        su = jnp.einsum("bh,bhd->bd", att, hist_e)             # [B, Dt]

        da = params["domain_attention"]
        b_s = jax.nn.relu(su * qi) @ da["w"] + da["b"]
        b_p = jax.nn.relu(pu * qi) @ da["w"] + da["b"]
        beta_s = jnp.exp(b_s) / (jnp.exp(b_s) + jnp.exp(b_p))
        zu = beta_s * su + (1 - beta_s) * pu
        return jnp.sum(zu * qi, axis=-1)

    # ----------------------------------------------------------------- losses

    def loss_fn(self, phase: str):
        if phase == "SOURCE":
            def loss(params, batch, rng=None):
                logit = self._phase1_logit(
                    params, batch[self.SOURCE_USER_ID], batch[self.SOURCE_ITEM_ID]
                )
                return bce_loss(logit, batch[self.SOURCE_LABEL], batch["source_sample_weight"])
            return loss

        def loss(params, batch, rng=None):
            logit = self._phase2_logit(
                params, batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID]
            )
            rec = bce_loss(logit, batch[self.TARGET_LABEL], batch["target_sample_weight"])
            reg = reg_loss(
                [
                    params["target_user_embedding"],
                    params["target_item_embedding"],
                    params["transfer"]["w"],
                    params["unit_attention"]["w"],
                    params["domain_attention"]["w"],
                ]
            )
            return rec + self.reg_weight * reg
        return loss

    def predict_fn(self):
        phase = self.phase

        def predict(params, batch):
            if phase == "SOURCE":
                return jax.nn.sigmoid(
                    self._phase1_logit(
                        params, batch[self.SOURCE_USER_ID], batch[self.SOURCE_ITEM_ID]
                    )
                )
            return jax.nn.sigmoid(
                self._phase2_logit(
                    params, batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID]
                )
            )

        return predict

    def full_sort_fn(self, phase: str = "TARGET"):
        if phase == "SOURCE":
            def full_sort(params, users):
                user_e = params["source_user_embedding"][users]
                all_item_e = jnp.concatenate(
                    [
                        params["source_item_embedding"][: self.overlapped_num_items],
                        params["source_item_embedding"][self.target_num_items :],
                    ],
                    axis=0,
                )
                return user_e @ all_item_e.T
            return full_sort
        # phase-2 scoring goes through the blocked predict fallback
        return None
