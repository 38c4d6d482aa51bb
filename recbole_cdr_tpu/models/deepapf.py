"""DeepAPF — Deep Attentive Probabilistic Factorization (Yan et al., IJCAI 2019).

Three embedding tables per entity side (source / target / shared); an
attention MLP softmax-weights the shared vs domain-specific parts, with the
share branch masked to -1e31 for non-overlapped entities. Joint BCE loss.

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/deepapf.py:23-175`
(including the reference's strict ``id > overlapped_num`` mask comparison and
the loaded-but-unused ``beta`` hyper-parameter). No full-sort method — the
trainer's blocked ``predict`` fallback scores full-sort evaluation.
"""

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bce_loss,
    init_embedding,
    init_linear,
    xavier_normal,
)
from recbole_cdr_tpu.utils.enums import InputType


class DeepAPF(CrossDomainRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        assert self.overlapped_num_items == 1 or self.overlapped_num_users == 1, (
            "DeepAPF model only support user overlapped or item overlapped dataset! "
        )
        if self.overlapped_num_users > 1:
            self.mode = "overlap_users"
        elif self.overlapped_num_items > 1:
            self.mode = "overlap_items"
        else:
            self.mode = "non_overlap"
        self.embedding_size = config["embedding_size"]

    def init_params(self, rng):
        keys = jax.random.split(rng, 10)
        D = self.embedding_size
        return {
            "source_user_embedding": init_embedding(keys[0], self.total_num_users, D),
            "target_user_embedding": init_embedding(keys[1], self.total_num_users, D),
            "share_user_embedding": init_embedding(keys[2], self.total_num_users, D),
            "source_item_embedding": init_embedding(keys[3], self.total_num_items, D),
            "target_item_embedding": init_embedding(keys[4], self.total_num_items, D),
            "share_item_embedding": init_embedding(keys[5], self.total_num_items, D),
            "user_mlp": [init_linear(keys[6], D, D), {"w": xavier_normal(keys[7], (D, 1))}],
            "item_mlp": [init_linear(keys[8], D, D), {"w": xavier_normal(keys[9], (D, 1))}],
            "predict_layer": xavier_normal(jax.random.fold_in(rng, 99), (D, 1)),
        }

    def trainable_predicate(self, phase):
        """The reference creates BOTH sides' share tables + attention MLPs
        (`deepapf.py:46-61`) but only the overlap mode's side is in the
        forward graph — the other side's params get no torch grads, so the
        single optimizer must never tick them (torch.optim.Adam skips
        None-grad params; see EMCDR.trainable_predicate). Verified against
        oracle grad liveness in tests/test_trainable_structure.py."""
        if self.mode == "overlap_users":
            dead = {"share_item_embedding", "item_mlp"}
        else:  # overlap_items and non_overlap use the item-side branch
            dead = {"share_user_embedding", "user_mlp"}
        return lambda name: name not in dead

    def _att_mlp(self, mlp, x):
        h = jax.nn.relu(x @ mlp[0]["w"] + mlp[0]["b"])
        return h @ mlp[1]["w"]  # [B, 1], no bias

    def _forward(self, params, user, item, domain: str):
        if self.mode == "overlap_users":
            share_e = params["share_user_embedding"][user]
            only_e = params[f"{domain}_user_embedding"][user]
            item_e = params[f"{domain}_item_embedding"][item]
            # strict > kept for parity with `deepapf.py:74`
            non_overlap = (user > self.overlapped_num_users)[:, None]

            a_share = self._att_mlp(params["user_mlp"], share_e * item_e)
            a_only = self._att_mlp(params["user_mlp"], only_e * item_e)
            a_share = jnp.where(non_overlap, -1e31, a_share)
            alpha = jax.nn.softmax(jnp.concatenate([a_share, a_only], axis=1), axis=1)
            entity_e = alpha[:, 0:1] * share_e + alpha[:, 1:2] * only_e
            other_e = item_e
        else:
            share_e = params["share_item_embedding"][item]
            only_e = params[f"{domain}_item_embedding"][item]
            user_e = params[f"{domain}_user_embedding"][user]
            non_overlap = (item > self.overlapped_num_items)[:, None]

            a_share = self._att_mlp(params["item_mlp"], share_e * user_e)
            a_only = self._att_mlp(params["item_mlp"], only_e * user_e)
            a_share = jnp.where(non_overlap, -1e31, a_share)
            alpha = jax.nn.softmax(jnp.concatenate([a_share, a_only], axis=1), axis=1)
            entity_e = alpha[:, 0:1] * share_e + alpha[:, 1:2] * only_e
            other_e = user_e
        logit = (entity_e * other_e) @ params["predict_layer"]
        return logit.squeeze(-1)

    def loss_fn(self, phase: str):
        def loss(params, batch, rng=None):
            s_logit = self._forward(
                params, batch[self.SOURCE_USER_ID], batch[self.SOURCE_ITEM_ID], "source"
            )
            t_logit = self._forward(
                params, batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID], "target"
            )
            return bce_loss(s_logit, batch[self.SOURCE_LABEL], batch["source_sample_weight"]) + (
                bce_loss(t_logit, batch[self.TARGET_LABEL], batch["target_sample_weight"])
            )

        return loss

    def predict_fn(self):
        def predict(params, batch):
            return jax.nn.sigmoid(
                self._forward(
                    params, batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID], "target"
                )
            )

        return predict
