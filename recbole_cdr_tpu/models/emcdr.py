"""EMCDR — Embedding and Mapping for Cross-Domain Recommendation
(Man et al., IJCAI 2017).

Three phases: (1) SOURCE — latent factors on the source domain; (2) TARGET —
independent latent factors on the target domain; (3) OVERLAP — learn a linear
or MLP mapping from source space to target space by MSE over the overlapped
entities. At inference, overlapped entities score through the mapped source
embedding.

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/emcdr.py:24-233`.
"""

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bpr_loss,
    emb_loss,
    init_embedding,
    init_mlp,
    weighted_mean,
    xavier_normal,
)


class EMCDR(CrossDomainRecommender):
    # no class-level input_type: config derives it from loss_type
    # (CE -> POINTWISE for MF; set loss_type: BPR for the pairwise variant)

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        assert self.overlapped_num_items == 1 or self.overlapped_num_users == 1, (
            "EMCDR model only support user overlapped or item overlapped dataset! "
        )
        if self.overlapped_num_users > 1:
            self.mode = "overlap_users"
        elif self.overlapped_num_items > 1:
            self.mode = "overlap_items"
        else:
            self.mode = "non_overlap"
        self.phase = "both"

        self.latent_factor_model = config["latent_factor_model"]
        self.is_pairwise = self.latent_factor_model != "MF"
        self.source_latent_dim = config["source_embedding_size"]
        self.target_latent_dim = config["target_embedding_size"]
        self.reg_weight = float(config["reg_weight"])
        self.map_func = config["mapping_function"]
        self.mlp_hidden_size = config["mlp_hidden_size"]

    def init_params(self, rng):
        keys = jax.random.split(rng, 5)
        p = {
            "source_user_embedding": init_embedding(
                keys[0], self.total_num_users, self.source_latent_dim
            ),
            "source_item_embedding": init_embedding(
                keys[1], self.total_num_items, self.source_latent_dim
            ),
            "target_user_embedding": init_embedding(
                keys[2], self.total_num_users, self.target_latent_dim
            ),
            "target_item_embedding": init_embedding(
                keys[3], self.total_num_items, self.target_latent_dim
            ),
        }
        # zero-fill rows outside each domain (reference `emcdr.py:73-78`)
        p["source_user_embedding"] = (
            p["source_user_embedding"].at[self.overlapped_num_users : self.target_num_users].set(0.0)
        )
        p["source_item_embedding"] = (
            p["source_item_embedding"].at[self.overlapped_num_items : self.target_num_items].set(0.0)
        )
        p["target_user_embedding"] = p["target_user_embedding"].at[self.target_num_users :].set(0.0)
        p["target_item_embedding"] = p["target_item_embedding"].at[self.target_num_items :].set(0.0)

        if self.map_func == "linear":
            p["mapping"] = xavier_normal(keys[4], (self.source_latent_dim, self.target_latent_dim))
        else:
            dims = [self.source_latent_dim] + list(self.mlp_hidden_size) + [self.target_latent_dim]
            p["mapping"] = init_mlp(keys[4], dims)
        return p

    def trainable_predicate(self, phase: str):
        """Exactly the parameters the phase's loss reaches — torch.optim only
        advances state for params whose grad is non-None, so params absent
        from a phase's graph must not tick their Adam step counts (a zero-
        grad 'update' warms the bias correction and turns the NEXT phase's
        first steps from ±lr into ~3x lr — measured as the TARGET-phase
        valid collapse at Amazon scale, results/parity_oracle.md r4)."""
        if phase == "SOURCE":
            live = {"source_user_embedding", "source_item_embedding"}
        elif phase == "TARGET":
            live = {"target_user_embedding", "target_item_embedding"}
        else:
            ent = "user" if self.mode == "overlap_users" else "item"
            live = {"mapping", f"source_{ent}_embedding", f"target_{ent}_embedding"}
        return lambda name: name in live

    def sparse_spec(self, phase: str):
        """Every phase's loss reaches the embedding tables only through
        batch ids (MF dots + EmbLoss on the gathered rows; the OVERLAP MSE
        maps gathered rows through the dense ``mapping``), so all three
        phases support the row-sparse optimizer."""
        if phase == "SOURCE":
            item_keys = [self.SOURCE_ITEM_ID]
            if self.is_pairwise:
                item_keys.append(self.SOURCE_NEG_ITEM_ID)
            return {"source_user_embedding": [self.SOURCE_USER_ID],
                    "source_item_embedding": item_keys}
        if phase == "TARGET":
            item_keys = [self.TARGET_ITEM_ID]
            if self.is_pairwise:
                item_keys.append(self.TARGET_NEG_ITEM_ID)
            return {"target_user_embedding": [self.TARGET_USER_ID],
                    "target_item_embedding": item_keys}
        ent = "user" if self.mode == "overlap_users" else "item"
        return {f"source_{ent}_embedding": ["overlap"],
                f"target_{ent}_embedding": ["overlap"]}

    # ------------------------------------------------------------------ parts

    def _map(self, params, x):
        if self.map_func == "linear":
            return x @ params["mapping"]
        # MLP with tanh between layers, none after the last (`emcdr.py:86-93`)
        layers = params["mapping"]
        for i, layer in enumerate(layers):
            x = x @ layer["w"] + layer["b"]
            if i != len(layers) - 1:
                x = jnp.tanh(x)
        return x

    def _dot(self, params, prefix, user, item):
        ue = params[f"{prefix}_user_embedding"][user]
        ie = params[f"{prefix}_item_embedding"][item]
        return jnp.sum(ue * ie, axis=-1)

    def _domain_loss(self, params, batch, prefix, uid_key, iid_key, neg_key, label_key, w_key):
        w = batch[w_key]
        if not self.is_pairwise:
            user, item = batch[uid_key], batch[iid_key]
            label = batch[label_key]
            pred = self._dot(params, prefix, user, item)
            base = weighted_mean((pred - label) ** 2, w)  # MSE
        else:
            user, item, neg = batch[uid_key], batch[iid_key], batch[neg_key]
            pos = self._dot(params, prefix, user, item)
            negs = self._dot(params, prefix, user, neg)
            base = bpr_loss(pos, negs, w)
        reg = emb_loss(
            [params[f"{prefix}_user_embedding"][batch[uid_key]],
             params[f"{prefix}_item_embedding"][batch[iid_key]]],
            w,
        )
        return base + self.reg_weight * reg

    # ----------------------------------------------------------------- losses

    def loss_fn(self, phase: str):
        if phase == "SOURCE":
            def loss(params, batch, rng=None):
                return self._domain_loss(
                    params, batch, "source",
                    self.SOURCE_USER_ID, self.SOURCE_ITEM_ID, self.SOURCE_NEG_ITEM_ID,
                    self.SOURCE_LABEL, "source_sample_weight",
                )
            return loss
        if phase == "OVERLAP":
            def loss(params, batch, rng=None):
                idx = batch["overlap"]
                w = batch["overlap_sample_weight"]
                if self.mode == "overlap_users":
                    src_e = params["source_user_embedding"][idx]
                    tgt_e = params["target_user_embedding"][idx]
                else:
                    src_e = params["source_item_embedding"][idx]
                    tgt_e = params["target_item_embedding"][idx]
                map_e = self._map(params, src_e)
                return weighted_mean(jnp.mean((map_e - tgt_e) ** 2, axis=-1), w)
            return loss

        def loss(params, batch, rng=None):
            return self._domain_loss(
                params, batch, "target",
                self.TARGET_USER_ID, self.TARGET_ITEM_ID, self.TARGET_NEG_ITEM_ID,
                self.TARGET_LABEL, "target_sample_weight",
            )
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
                return self._dot(
                    params, "source", batch[self.SOURCE_USER_ID], batch[self.SOURCE_ITEM_ID]
                )
            if phase == "TARGET":
                return self._dot(
                    params, "target", batch[self.TARGET_USER_ID], batch[self.TARGET_ITEM_ID]
                )
            user = batch[self.TARGET_USER_ID]
            item = batch[self.TARGET_ITEM_ID]
            if self.mode == "overlap_users":
                user_e = self._mapped_user_e(params, user)
                item_e = params["target_item_embedding"][item]
            else:
                user_e = params["target_user_embedding"][user]
                mapped = self._map(params, params["source_item_embedding"][item])
                direct = params["target_item_embedding"][item]
                item_e = jnp.where((item < self.overlapped_num_items)[:, None], mapped, direct)
            return jnp.sum(user_e * item_e, axis=-1)

        return predict

    def full_sort_fn(self, phase: str = "TARGET"):
        if phase == "SOURCE":
            def full_sort(params, users):
                user_e = params["source_user_embedding"][users]
                # compacted source item space: overlap prefix ++ source-only suffix
                all_item_e = jnp.concatenate(
                    [
                        params["source_item_embedding"][: self.overlapped_num_items],
                        params["source_item_embedding"][self.target_num_items :],
                    ],
                    axis=0,
                )
                return user_e @ all_item_e.T
            return full_sort
        if phase == "TARGET":
            def full_sort(params, users):
                user_e = params["target_user_embedding"][users]
                return user_e @ params["target_item_embedding"][: self.target_num_items].T
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
            return user_e @ all_item_e.T

        return full_sort

    def full_sort_factors(self, phase: str = "TARGET"):
        """Dot-product factor form of :meth:`full_sort_fn` (streaming/
        mesh-sharded large-item eval): same user representation and item
        table, dot deferred to the tiled top-k."""
        if phase == "SOURCE":
            def factors(params, users):
                user_e = params["source_user_embedding"][users]
                all_item_e = jnp.concatenate(
                    [
                        params["source_item_embedding"][: self.overlapped_num_items],
                        params["source_item_embedding"][self.target_num_items:],
                    ],
                    axis=0,
                )
                return user_e, all_item_e
            return factors
        if phase == "TARGET":
            def factors(params, users):
                return (
                    params["target_user_embedding"][users],
                    params["target_item_embedding"][: self.target_num_items],
                )
            return factors

        def factors(params, users):
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
            return user_e, all_item_e

        return factors
