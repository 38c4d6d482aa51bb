"""CoNet — Collaborative Cross Networks (Hu et al., CIKM 2018).

Twin MLP towers on ``[user_e || item_e]`` per domain with per-layer
cross-stitch units: overlapped rows add ``other_tower_input @ W_cross`` (one
shared cross matrix per layer, used in both directions). Joint BCE loss plus
the sum of cross-matrix norms (the reference adds the norms unweighted —
``reg_weight`` is loaded but unused, `conet.py:198-201` — kept for parity).

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/conet.py:25-242`.
Full-sort scoring runs the target tower only (as the reference does) but as a
single batched [B*I] matmul chain instead of a per-user python loop.
"""

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bce_loss,
    init_embedding,
    init_linear,
    reg_loss,
    weighted_mean,
    xavier_normal,
)
from recbole_cdr_tpu.utils.enums import InputType


class CoNet(CrossDomainRecommender):
    input_type = InputType.POINTWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        assert self.overlapped_num_items == 1 or self.overlapped_num_users == 1, (
            "CoNet model only support user overlapped or item overlapped dataset! "
        )
        if self.overlapped_num_users > 1:
            self.mode = "overlap_users"
        elif self.overlapped_num_items > 1:
            self.mode = "overlap_items"
        else:
            self.mode = "non_overlap"

        self.latent_dim = config["embedding_size"]
        self.reg_weight = float(config["reg_weight"])
        self.cross_layers = list(config["mlp_hidden_size"])

    def init_params(self, rng):
        keys = jax.random.split(rng, 8)
        dims = [2 * self.latent_dim] + self.cross_layers
        p = {
            "source_user_embedding": init_embedding(keys[0], self.total_num_users, self.latent_dim),
            "target_user_embedding": init_embedding(keys[1], self.total_num_users, self.latent_dim),
            "source_item_embedding": init_embedding(keys[2], self.total_num_items, self.latent_dim),
            "target_item_embedding": init_embedding(keys[3], self.total_num_items, self.latent_dim),
        }
        # zero-fill rows outside each domain (reference `conet.py:65-70`)
        p["source_user_embedding"] = (
            p["source_user_embedding"].at[self.overlapped_num_users : self.target_num_users].set(0.0)
        )
        p["source_item_embedding"] = (
            p["source_item_embedding"].at[self.overlapped_num_items : self.target_num_items].set(0.0)
        )
        p["target_user_embedding"] = p["target_user_embedding"].at[self.target_num_users :].set(0.0)
        p["target_item_embedding"] = p["target_item_embedding"].at[self.target_num_items :].set(0.0)

        def tower(key):
            ks = jax.random.split(key, len(dims) - 1)
            return [init_linear(ks[i], dims[i], dims[i + 1]) for i in range(len(dims) - 1)]

        p["source_tower"] = tower(keys[4])
        p["target_tower"] = tower(keys[5])
        k_out1, k_out2 = jax.random.split(keys[7])
        p["source_out"] = init_linear(k_out1, self.cross_layers[-1], 1)
        p["target_out"] = init_linear(k_out2, self.cross_layers[-1], 1)
        kc = jax.random.split(keys[6], len(dims) - 1)
        # cross matrices stored as [d_in, d_out] (applied as x @ W)
        p["cross"] = [xavier_normal(kc[i], (dims[i], dims[i + 1])) for i in range(len(dims) - 1)]
        return p

    # ------------------------------------------------------------------ parts

    def _coupled_towers(self, params, user, item):
        """Run both towers with cross-stitch on overlapped rows; returns the
        final hidden of (source_tower, target_tower)."""
        src_x = jnp.concatenate(
            [params["source_user_embedding"][user], params["source_item_embedding"][item]], axis=-1
        )
        tgt_x = jnp.concatenate(
            [params["target_user_embedding"][user], params["target_item_embedding"][item]], axis=-1
        )
        if self.mode == "overlap_users":
            overlap = user < self.overlapped_num_users
        else:
            overlap = item < self.overlapped_num_items
        overlap = overlap[:, None].astype(src_x.dtype)

        for s_layer, t_layer, cross in zip(
            params["source_tower"], params["target_tower"], params["cross"]
        ):
            s_out = src_x @ s_layer["w"] + s_layer["b"] + overlap * (tgt_x @ cross)
            t_out = tgt_x @ t_layer["w"] + t_layer["b"] + overlap * (src_x @ cross)
            src_x = jax.nn.relu(s_out)
            tgt_x = jax.nn.relu(t_out)
        return src_x, tgt_x

    def _target_tower_only(self, params, x):
        for layer in params["target_tower"]:
            x = jax.nn.relu(x @ layer["w"] + layer["b"])
        return x

    # ----------------------------------------------------------------- losses

    def loss_fn(self, phase: str):
        def loss(params, batch, rng=None):
            su, si = batch[self.SOURCE_USER_ID], batch[self.SOURCE_ITEM_ID]
            tu, ti = batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID]
            sl, tl = batch[self.SOURCE_LABEL], batch[self.TARGET_LABEL]
            sw, tw = batch["source_sample_weight"], batch["target_sample_weight"]

            s_hidden, _ = self._coupled_towers(params, su, si)
            _, t_hidden = self._coupled_towers(params, tu, ti)
            s_logit = (s_hidden @ params["source_out"]["w"] + params["source_out"]["b"]).squeeze(-1)
            t_logit = (t_hidden @ params["target_out"]["w"] + params["target_out"]["b"]).squeeze(-1)

            loss_s = bce_loss(s_logit, sl, sw)
            loss_t = bce_loss(t_logit, tl, tw)
            # parity: unweighted sum of cross-matrix norms (`conet.py:198-201`)
            return loss_s + loss_t + reg_loss(params["cross"])

        return loss

    # ---------------------------------------------------------------- scoring

    def predict_fn(self):
        def predict(params, batch):
            user = batch[self.TARGET_USER_ID]
            item = batch[self.TARGET_ITEM_ID]
            x = jnp.concatenate(
                [params["target_user_embedding"][user], params["target_item_embedding"][item]],
                axis=-1,
            )
            h = self._target_tower_only(params, x)
            return jax.nn.sigmoid(
                (h @ params["target_out"]["w"] + params["target_out"]["b"]).squeeze(-1)
            )

        return predict

    def full_sort_fn(self, phase: str = "TARGET"):
        n_target = self.target_num_items
        d = self.latent_dim

        def full_sort(params, users):
            B = users.shape[0]
            user_e = params["target_user_embedding"][users]          # [B, D]
            item_e = params["target_item_embedding"][:n_target]       # [I, D]
            # first layer decomposed: x @ W = u @ W_u + i @ W_i
            first = params["target_tower"][0]
            w_u, w_i = first["w"][:d], first["w"][d:]
            h = user_e @ w_u
            h = h[:, None, :] + (item_e @ w_i)[None, :, :] + first["b"]
            h = jax.nn.relu(h)                                        # [B, I, H0]
            for layer in params["target_tower"][1:]:
                h = jax.nn.relu(h @ layer["w"] + layer["b"])
            logit = (h @ params["target_out"]["w"] + params["target_out"]["b"]).squeeze(-1)
            return jax.nn.sigmoid(logit)                              # [B, I]

        return full_sort
