"""DCDCSR — Deep framework for Cross-Domain and Cross-System Recommendations
(Zhu et al., IJCAI 2018).

Schedule ``SOURCE, TARGET, BOTH, TARGET``: BPR latent factors per domain; at
BOTH entry a "benchmark" embedding is built — overlapped rows are
sparsity-weighted blends, non-overlapped rows blend the top-k most similar
source-overlap rows — and an MLP is trained to map the target factors onto the
benchmark; the second TARGET pass re-trains items (or users) against the
frozen affine-mapped embeddings.

Behavioral parity with `recbole_cdr/model/cross_domain_recommender/dcdcsr.py:25-280`.
TPU redesign: the reference's per-unit python loop over all units x top-k
(`dcdcsr.py:136-159`) becomes one batched matmul + ``jax.lax.top_k`` on device.
"""

import numpy as np

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.models.base import (
    CrossDomainRecommender,
    bpr_loss,
    init_embedding,
    init_mlp,
    weighted_mean,
)
from recbole_cdr_tpu.utils.enums import InputType


class DCDCSR(CrossDomainRecommender):
    input_type = InputType.PAIRWISE

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        assert self.overlapped_num_items == 1 or self.overlapped_num_users == 1, (
            "DCDCSR model only support user overlapped or item overlapped dataset! "
        )
        if self.overlapped_num_users > 1:
            self.mode = "overlap_users"
        elif self.overlapped_num_items > 1:
            self.mode = "overlap_items"
        else:
            self.mode = "non_overlap"
        self.phase = None
        self.phase2count = {"SOURCE": 0, "TARGET": 0, "BOTH": 0, "OVERLAP": 0}

        self.latent_factor_model = config["latent_factor_model"]
        assert self.latent_factor_model in ("BPR",), "latent_factor model must be in [BPR]"
        self.embedding_size = config["embedding_size"]
        self.mlp_hidden_size = list(config["mlp_hidden_size"])
        self.k = config["k"]
        self.map_batch_size = config["map_batch_size"]

        # per-unit interaction counts ("popularity"/sparsity degrees)
        if self.mode == "overlap_users":
            _, _, s_lens = dataset.history_item_matrix(domain="source")
            _, _, t_lens = dataset.history_item_matrix(domain="target")
        else:
            _, _, s_lens = dataset.history_user_matrix(domain="source")
            _, _, t_lens = dataset.history_user_matrix(domain="target")
        self._source_pop = jnp.asarray(s_lens, dtype=jnp.float32)
        self._target_pop = jnp.asarray(t_lens, dtype=jnp.float32)
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
            # derived (frozen) buffers, populated on phase entry
            "benchmark_embedding": jnp.zeros((1, D)),
            "affine_embedding": jnp.zeros((1, D)),
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

    # ------------------------------------------------------------ phase hooks

    def set_phase(self, phase):
        self.phase = phase
        self.phase2count[phase] += 1

    def scoring_cache_key(self, phase):
        return f"{phase}:{self.phase2count.get(phase, 0)}"

    def trainable_predicate(self, phase):
        """Params the phase's loss reaches (torch advances Adam state only
        for non-None grads; see EMCDR.trainable_predicate). benchmark/affine
        stay plain buffers (never optimized, reference `dcdcsr.py:98-117`)."""
        frozen = {"benchmark_embedding", "affine_embedding"}
        count = self.phase2count.get(phase, 0)
        if phase == "SOURCE":
            live = {"source_user_embedding", "source_item_embedding"}
        elif phase == "BOTH":
            # map loss flows through the sampled unit rows into their table
            unit = ("target_user_embedding" if self.mode == "overlap_users"
                    else "target_item_embedding")
            live = {"mapping", unit}
        elif phase == "TARGET" and count == 2:
            # affine retrain: the affine side is a frozen buffer, BPR only
            # reaches the OTHER table
            live = ({"target_item_embedding"} if self.mode == "overlap_users"
                    else {"target_user_embedding"})
        else:
            live = {"target_user_embedding", "target_item_embedding"}
        return lambda name: name in live and name not in frozen

    def sparse_spec(self, phase):
        """BPR phases touch their tables only through batch ids. BOTH runs on
        the host path (map_sample_idx augment) and keeps the dense update;
        the TARGET#2 affine side is a frozen buffer read from the dense part."""
        count = self.phase2count.get(phase, 0)
        if phase == "SOURCE":
            return {"source_user_embedding": [self.SOURCE_USER_ID],
                    "source_item_embedding": [self.SOURCE_ITEM_ID,
                                              self.SOURCE_NEG_ITEM_ID]}
        if phase == "TARGET" and count == 2:
            if self.mode == "overlap_users":
                return {"target_item_embedding": [self.TARGET_ITEM_ID,
                                                  self.TARGET_NEG_ITEM_ID]}
            return {"target_user_embedding": [self.TARGET_USER_ID]}
        if phase == "TARGET":
            return {"target_user_embedding": [self.TARGET_USER_ID],
                    "target_item_embedding": [self.TARGET_ITEM_ID,
                                              self.TARGET_NEG_ITEM_ID]}
        return None

    def _map(self, params, x):
        # MLPLayers(activation='tanh'): tanh after every layer
        for layer in params["mapping"]:
            x = jnp.tanh(x @ layer["w"] + layer["b"])
        return x

    @staticmethod
    def _maxmin_normalize(e):
        min_ = jnp.min(e, axis=1, keepdims=True)
        max_ = jnp.max(e, axis=1, keepdims=True)
        mean_ = (max_ + min_) / 2
        denom = jnp.where(max_ - mean_ == 0, 1.0, max_ - mean_)
        return (e - mean_) / denom, mean_, max_

    def _build_benchmark(self, params):
        """Vectorized benchmark build (reference python loop `dcdcsr.py:136-159`
        -> one [M, n_overlap] matmul + top-k)."""
        if self.mode == "overlap_users":
            n_total, n_ov = self.total_num_users, self.overlapped_num_users
            src_overlap = params["source_user_embedding"][:n_ov]
            tgt_emb = params["target_user_embedding"]
        else:
            n_total, n_ov = self.total_num_items, self.overlapped_num_items
            src_overlap = params["source_item_embedding"][:n_ov]
            tgt_emb = params["target_item_embedding"]
        s_pop, t_pop = self._source_pop, self._target_pop

        # overlapped rows: sparsity-weighted blend
        denom = s_pop[:n_ov] + t_pop[:n_ov]
        denom = jnp.where(denom == 0, 1.0, denom)
        alpha_s = (s_pop[:n_ov] / denom)[:, None]
        bench_overlap = alpha_s * tgt_emb[:n_ov] + (1 - alpha_s) * src_overlap

        # non-overlapped rows: blend of top-k most similar source-overlap
        # rows. Slice to the LOGICAL vocab n_total: under a mesh the tables
        # arrive sharding-PADDED (parallel/mesh.pad_tables_for_sharding), and
        # the pad rows have no popularity entry (found by the multichip
        # dryrun's DCDCSR sub-check). The benchmark stays [n_total, D] — a
        # derived buffer, like the affine table.
        rest = tgt_emb[n_ov:n_total]                         # [M, D]
        sims = rest @ src_overlap.T                          # [M, n_ov]
        k = min(self.k, src_overlap.shape[0])
        sim, idx = jax.lax.top_k(sims, k)                    # [M, k]
        sn = jnp.mean(s_pop[idx], axis=1)                    # [M]
        beta = sn / (sn + t_pop[n_ov:])                      # [M]
        sim_e = jnp.einsum("mk,mkd->md", sim, src_overlap[idx])
        sum_sim = jnp.sum(sim, axis=1)
        sum_sim = jnp.where(sum_sim > 0, sum_sim, 1.0)
        sim_e = sim_e / sum_sim[:, None]
        bench_rest = (1 - beta)[:, None] * rest + beta[:, None] * sim_e

        return jnp.concatenate([bench_overlap, bench_rest], axis=0)

    def mutate_params_on_phase(self, params, phase):
        if phase == "BOTH" and self.mode != "non_overlap":
            params = dict(params)
            params["benchmark_embedding"] = jax.jit(self._build_benchmark)(params)
        if phase == "TARGET" and self.phase2count["TARGET"] == 2:
            params = dict(params)
            if self.mode == "overlap_users":
                src = params["target_user_embedding"][: self.target_num_users]
            else:
                src = params["target_item_embedding"][: self.target_num_items]
            normal, mean_, max_ = self._maxmin_normalize(src)
            affine = self._map(params, normal) * (max_ - mean_) + mean_
            params["affine_embedding"] = jax.lax.stop_gradient(affine)
        return params

    # --------------------------------------------------------- host sampling

    def needs_host_augment(self, phase):
        return phase == "BOTH"

    def augment_batch(self, batch, phase):
        if phase != "BOTH":
            return batch
        n_units = self.target_num_users if self.mode == "overlap_users" else self.target_num_items
        batch = dict(batch)
        batch["map_sample_idx"] = self._rng.integers(
            0, n_units, self.map_batch_size
        ).astype(np.int64)
        return batch

    # ----------------------------------------------------------------- losses

    def _bpr(self, params, batch, user_table, item_table, uid_key, iid_key, neg_key, w_key):
        u = batch[uid_key]
        pos = batch[iid_key]
        neg = batch[neg_key]
        w = batch[w_key]
        ue = user_table[u]
        pos_score = jnp.sum(ue * item_table[pos], axis=-1)
        neg_score = jnp.sum(ue * item_table[neg], axis=-1)
        return bpr_loss(pos_score, neg_score, w)

    def loss_fn(self, phase: str):
        count = self.phase2count.get(phase, 0)
        if phase == "SOURCE":
            def loss(params, batch, rng=None):
                return self._bpr(
                    params, batch,
                    params["source_user_embedding"], params["source_item_embedding"],
                    self.SOURCE_USER_ID, self.SOURCE_ITEM_ID, self.SOURCE_NEG_ITEM_ID,
                    "source_sample_weight",
                )
            return loss
        if phase == "BOTH":
            def loss(params, batch, rng=None):
                idx = batch["map_sample_idx"]
                if self.mode == "overlap_users":
                    unit_e = params["target_user_embedding"][idx]
                else:
                    unit_e = params["target_item_embedding"][idx]
                unit_n, _, _ = self._maxmin_normalize(unit_e)
                mapped = self._map(params, unit_n)
                bench = params["benchmark_embedding"][idx]
                bench_n, _, _ = self._maxmin_normalize(bench)
                return jnp.mean((mapped - bench_n) ** 2)
            return loss
        if phase == "TARGET" and count == 2:
            def loss(params, batch, rng=None):
                if self.mode == "overlap_users":
                    return self._bpr(
                        params, batch,
                        params["affine_embedding"], params["target_item_embedding"],
                        self.TARGET_USER_ID, self.TARGET_ITEM_ID, self.TARGET_NEG_ITEM_ID,
                        "target_sample_weight",
                    )
                return self._bpr(
                    params, batch,
                    params["target_user_embedding"], params["affine_embedding"],
                    self.TARGET_USER_ID, self.TARGET_ITEM_ID, self.TARGET_NEG_ITEM_ID,
                    "target_sample_weight",
                )
            return loss

        def loss(params, batch, rng=None):
            return self._bpr(
                params, batch,
                params["target_user_embedding"], params["target_item_embedding"],
                self.TARGET_USER_ID, self.TARGET_ITEM_ID, self.TARGET_NEG_ITEM_ID,
                "target_sample_weight",
            )
        return loss

    # ---------------------------------------------------------------- scoring

    def _tables_for_scoring(self, params, phase):
        count = self.phase2count.get(phase, 0)
        use_affine = (phase == "TARGET" and count >= 2) or phase in ("OVERLAP", "BOTH")
        if use_affine and self.mode == "overlap_users":
            return params["affine_embedding"], params["target_item_embedding"][: self.target_num_items]
        if use_affine and self.mode == "overlap_items":
            return params["target_user_embedding"], params["affine_embedding"]
        return (
            params["target_user_embedding"],
            params["target_item_embedding"][: self.target_num_items],
        )

    def predict_fn(self):
        phase = self.phase

        def predict(params, batch):
            if phase == "SOURCE" and self.phase2count["SOURCE"] == 1:
                u = batch[self.SOURCE_USER_ID]
                i = batch[self.SOURCE_ITEM_ID]
                return jnp.sum(
                    params["source_user_embedding"][u] * params["source_item_embedding"][i], axis=-1
                )
            user_table, item_table = self._tables_for_scoring(params, phase)
            u = batch[self.TARGET_USER_ID]
            i = batch[self.TARGET_ITEM_ID]
            return jnp.sum(user_table[u] * item_table[i], axis=-1)

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

        count = self.phase2count.get(phase, 0)

        def full_sort(params, users):
            user_table, item_table = self._tables_for_scoring(params, phase)
            return user_table[users] @ item_table.T

        return full_sort

    def full_sort_factors(self, phase: str = "TARGET"):
        """Dot-product factor form (streaming/mesh-sharded large-item eval)."""
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

        def factors(params, users):
            user_table, item_table = self._tables_for_scoring(params, phase)
            return user_table[users], item_table

        return factors
