"""CLFM — Cluster-Level Latent Factor Model (Gao et al., PKDD 2013).

Per-domain user/item tables; each domain's user embedding is projected through
a SHARED linear map (width ``share_embedding_size``) plus a domain-private
remainder map, concatenated and dotted with the item embedding. BCE objective
``alpha * source + (1 - alpha) * target`` with EmbLoss regularization.

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/clfm.py:23-145`.
"""

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bce_loss,
    emb_loss,
    init_embedding,
    xavier_normal,
)
from recbole_cdr_tpu.utils.enums import InputType


class CLFM(CrossDomainRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.user_embedding_size = config["user_embedding_size"]
        # reference quirk kept for parity: target width also reads
        # source_item_embedding_size (`clfm.py:38`)
        self.source_item_embedding_size = config["source_item_embedding_size"]
        self.target_item_embedding_size = config["source_item_embedding_size"]
        self.share_embedding_size = config["share_embedding_size"]
        self.alpha = float(config["alpha"])
        self.reg_weight = float(config["reg_weight"])
        assert 0 <= self.share_embedding_size <= self.source_item_embedding_size
        assert 0 <= self.share_embedding_size <= self.target_item_embedding_size

    def init_params(self, rng):
        keys = jax.random.split(rng, 7)
        d_u = self.user_embedding_size
        params = {
            "source_user_embedding": init_embedding(keys[0], self.total_num_users, d_u),
            "target_user_embedding": init_embedding(keys[1], self.total_num_users, d_u),
            "source_item_embedding": init_embedding(
                keys[2], self.total_num_items, self.source_item_embedding_size
            ),
            "target_item_embedding": init_embedding(
                keys[3], self.total_num_items, self.target_item_embedding_size
            ),
        }
        if self.share_embedding_size > 0:
            params["shared_linear"] = xavier_normal(keys[4], (d_u, self.share_embedding_size))
        if self.source_item_embedding_size - self.share_embedding_size > 0:
            params["source_only_linear"] = xavier_normal(
                keys[5], (d_u, self.source_item_embedding_size - self.share_embedding_size)
            )
        if self.target_item_embedding_size - self.share_embedding_size > 0:
            params["target_only_linear"] = xavier_normal(
                keys[6], (d_u, self.target_item_embedding_size - self.share_embedding_size)
            )
        return params

    def _factors(self, params, user_e, domain: str):
        parts = []
        if self.share_embedding_size > 0:
            parts.append(user_e @ params["shared_linear"])
        only_key = f"{domain}_only_linear"
        if only_key in params:
            parts.append(user_e @ params[only_key])
        return jnp.concatenate(parts, axis=-1)

    def _forward(self, params, user, item, domain: str):
        user_e = params[f"{domain}_user_embedding"][user]
        item_e = params[f"{domain}_item_embedding"][item]
        factors = self._factors(params, user_e, domain)
        return jnp.sum(factors * item_e, axis=-1)  # logits

    def loss_fn(self, phase: str):
        def loss(params, batch, rng=None):
            sl = batch[self.SOURCE_LABEL]
            tl = batch[self.TARGET_LABEL]
            sw = batch["source_sample_weight"]
            tw = batch["target_sample_weight"]
            su, si = batch[self.SOURCE_USER_ID], batch[self.SOURCE_ITEM_ID]
            tu, ti = batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID]

            loss_s = bce_loss(self._forward(params, su, si, "source"), sl, sw) + (
                self.reg_weight
                * emb_loss(
                    [params["source_user_embedding"][su], params["source_item_embedding"][si]], sw
                )
            )
            loss_t = bce_loss(self._forward(params, tu, ti, "target"), tl, tw) + (
                self.reg_weight
                * emb_loss(
                    [params["target_user_embedding"][tu], params["target_item_embedding"][ti]], tw
                )
            )
            return loss_s * self.alpha + loss_t * (1.0 - self.alpha)

        return loss

    def predict_fn(self):
        def predict(params, batch):
            return jax.nn.sigmoid(
                self._forward(
                    params, batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID], "target"
                )
            )

        return predict

    def full_sort_fn(self, phase: str = "TARGET"):
        n_target = self.target_num_items

        def full_sort(params, users):
            user_e = params["target_user_embedding"][users]
            factors = self._factors(params, user_e, "target")
            all_item_e = params["target_item_embedding"][:n_target]
            return factors @ all_item_e.T

        return full_sort

    def full_sort_factors(self, phase: str = "TARGET"):
        """Dot-product factor form (streaming/mesh-sharded large-item eval)."""
        n_target = self.target_num_items

        def factors(params, users):
            user_e = params["target_user_embedding"][users]
            return (
                self._factors(params, user_e, "target"),
                params["target_item_embedding"][:n_target],
            )

        return factors
