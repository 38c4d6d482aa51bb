"""CMF — Collective Matrix Factorization (Singh & Gordon, SIGKDD 2008).

One shared user table + one shared item table over the unified ID space,
jointly factorizing both domains' interaction matrices with a BCE objective:
``alpha * loss_source + (1 - alpha) * loss_target`` plus per-domain EmbLoss
regularization.

Behavioral parity with the reference implementation
(`recbole_cdr/model/cross_domain_recommender/cmf.py:23-112`), re-expressed as
pure functions: the hot path is two fused gather+dot score ops per step that
XLA maps straight onto the MXU; full-sort scoring is a single
``[B, D] @ [D, target_num_items]`` matmul against the contiguous target
prefix of the item table.
"""

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bce_loss,
    emb_loss,
    init_embedding,
)
from recbole_cdr_tpu.utils.enums import InputType


class CMF(CrossDomainRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.alpha = float(config["alpha"])
        self.lamda = float(config["lambda"])
        self.gamma = float(config["gamma"])

    def init_params(self, rng):
        k_user, k_item = jax.random.split(rng)
        return {
            "user_embedding": init_embedding(k_user, self.total_num_users, self.embedding_size),
            "item_embedding": init_embedding(k_item, self.total_num_items, self.embedding_size),
        }

    def _score(self, params, user, item):
        user_e = params["user_embedding"][user]
        item_e = params["item_embedding"][item]
        return jnp.sum(user_e * item_e, axis=-1)  # logits

    def loss_fn(self, phase: str):
        def loss(params, batch, rng=None):
            su = batch[self.SOURCE_USER_ID]
            si = batch[self.SOURCE_ITEM_ID]
            sl = batch[self.SOURCE_LABEL]
            sw = batch["source_sample_weight"]
            tu = batch[self.TARGET_USER_ID]
            ti = batch[self.TARGET_ITEM_ID]
            tl = batch[self.TARGET_LABEL]
            tw = batch["target_sample_weight"]

            loss_s = bce_loss(self._score(params, su, si), sl, sw) + self.lamda * emb_loss(
                [params["user_embedding"][su], params["item_embedding"][si]], sw
            )
            loss_t = bce_loss(self._score(params, tu, ti), tl, tw) + self.gamma * emb_loss(
                [params["user_embedding"][tu], params["item_embedding"][ti]], tw
            )
            return loss_s * self.alpha + loss_t * (1.0 - self.alpha)

        return loss

    def sparse_spec(self, phase: str):
        """Both tables are touched only through batch ids (scores + EmbLoss
        on the gathered rows), so CMF supports the row-sparse optimizer in
        every phase (its schedule is BOTH-only)."""
        return {
            "user_embedding": [self.SOURCE_USER_ID, self.TARGET_USER_ID],
            "item_embedding": [self.SOURCE_ITEM_ID, self.TARGET_ITEM_ID],
        }

    def predict_fn(self):
        def predict(params, batch):
            return jax.nn.sigmoid(
                self._score(params, batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID])
            )

        return predict

    def full_sort_fn(self, phase: str = "TARGET"):
        n_target = self.target_num_items

        def full_sort(params, users):
            user_e = params["user_embedding"][users]
            all_item_e = params["item_embedding"][:n_target]
            return user_e @ all_item_e.T

        return full_sort

    def full_sort_factors(self, phase: str = "TARGET"):
        n_target = self.target_num_items

        def factors(params, users):
            return params["user_embedding"][users], params["item_embedding"][:n_target]

        return factors
