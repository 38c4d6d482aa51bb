"""Full-sort evaluation driver.

Scores each batch of users against the full item axis on device (one jitted
program: score -> history mask -> PAD mask -> top-k), then computes
recbole-exact ranking metrics on host from the top-k indices.

Capability parity with the inherited recbole ``Trainer.evaluate`` +
``Collector``/``Evaluator`` loop described in SURVEY §3.3 (reference
`recbole_cdr/trainer/trainer.py` and recbole 1.0.1 evaluator stack).
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from recbole_cdr_tpu.evaluator.metrics import compute_topk_metrics


@partial(jax.jit, static_argnames=("k",))
def _mask_and_topk(scores: jnp.ndarray, hist: jnp.ndarray, hist_mask: jnp.ndarray, k: int):
    """scores[B, I] -> top-k indices after masking history + PAD column."""
    B = scores.shape[0]
    neg_inf = jnp.finfo(scores.dtype).min
    rows = jnp.arange(B)[:, None]
    # scatter -inf into history slots; padded slots point at column 0 which is
    # masked anyway (PAD item)
    safe_hist = jnp.where(hist_mask, hist, 0)
    scores = scores.at[rows, safe_hist].min(jnp.where(hist_mask, neg_inf, jnp.inf))
    scores = scores.at[:, 0].set(neg_inf)
    _, topk_idx = jax.lax.top_k(scores, k)
    return topk_idx


@partial(jax.jit, static_argnames=("k",))
def _candidate_topk(scores: jnp.ndarray, cand_mask: jnp.ndarray, k: int):
    neg_inf = jnp.finfo(scores.dtype).min
    scores = jnp.where(cand_mask, scores, neg_inf)
    _, topk_idx = jax.lax.top_k(scores, k)
    return topk_idx


class FullSortEvaluator:
    """Evaluate a model's full-sort ranking quality over eval batches."""

    def __init__(self, config):
        self.metrics = [m.lower() for m in config["metrics"]]
        self.topk = config["topk"]
        self.max_k = max(self.topk)
        self.decimal_place = config["metric_decimal_place"] or 4

    def evaluate(self, score_fn, params, eval_batches, item_num=None) -> Dict[str, float]:
        """Args:
            score_fn: ``(params, user_ids[B]) -> scores[B, item_num]`` (jitted).
            eval_batches: a :class:`FullSortEvalBatches`.
        Returns {metric@k: value} averaged over users.
        """
        all_pos_index = []
        all_pos_len = []
        user_offset = 0
        pos_keys = eval_batches.pos_keys_sorted
        item_num = eval_batches.item_num
        for uids, hist, hist_mask, n_real in eval_batches:
            scores = score_fn(params, jnp.asarray(uids))
            topk_idx = _mask_and_topk(scores, jnp.asarray(hist), jnp.asarray(hist_mask), self.max_k)
            topk_idx = np.asarray(topk_idx)[:n_real]
            # one searchsorted for the whole batch: hit iff the
            # (user_order, item) key exists among the positives
            owners = (user_offset + np.arange(n_real, dtype=np.int64))[:, None]
            q = owners * item_num + topk_idx
            loc = np.searchsorted(pos_keys, q)
            loc = np.minimum(loc, max(len(pos_keys) - 1, 0))
            hits = pos_keys[loc] == q if len(pos_keys) else np.zeros_like(q, bool)
            all_pos_index.append(hits)
            all_pos_len.append(eval_batches.pos_lens[user_offset:user_offset + n_real])
            user_offset += n_real

        if not all_pos_index:
            return {f"{m}@{k}": 0.0 for m in self.metrics for k in self.topk}
        pos_index = np.concatenate(all_pos_index, axis=0)
        pos_len = np.concatenate(all_pos_len).astype(np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.metrics, self.topk)
        return {k: round(v, self.decimal_place) for k, v in result.items()}

    def evaluate_streaming(self, factors_fn, params, eval_batches):
        """Full-sort evaluation via streaming tiled top-k — the [B, items]
        score matrix never materializes (ops/topk.py). Used for large item
        spaces when the model's full-sort is a dot product."""
        from recbole_cdr_tpu.ops.topk import streaming_topk_with_history

        factors = jax.jit(factors_fn)
        all_pos_index, all_pos_len = [], []
        user_offset = 0
        pos_keys = eval_batches.pos_keys_sorted
        item_num = eval_batches.item_num
        for uids, hist, hist_mask, n_real in eval_batches:
            user_e, item_table = factors(params, jnp.asarray(uids))
            hist_sorted = jnp.sort(
                jnp.where(jnp.asarray(hist_mask), jnp.asarray(hist), item_num), axis=1
            )
            _, topk_idx = streaming_topk_with_history(
                user_e, item_table, hist_sorted, self.max_k
            )
            topk_idx = np.asarray(topk_idx)[:n_real]
            owners = (user_offset + np.arange(n_real, dtype=np.int64))[:, None]
            q = owners * item_num + topk_idx
            loc = np.searchsorted(pos_keys, q)
            loc = np.minimum(loc, max(len(pos_keys) - 1, 0))
            hits = pos_keys[loc] == q if len(pos_keys) else np.zeros_like(q, bool)
            all_pos_index.append(hits)
            all_pos_len.append(eval_batches.pos_lens[user_offset:user_offset + n_real])
            user_offset += n_real

        if not all_pos_index:
            return {f"{m}@{k}": 0.0 for m in self.metrics for k in self.topk}
        pos_index = np.concatenate(all_pos_index, axis=0)
        pos_len = np.concatenate(all_pos_len).astype(np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.metrics, self.topk)
        return {k: round(v, self.decimal_place) for k, v in result.items()}

    def evaluate_candidates(self, predict_fn, params, eval_batches,
                            uid_key: str, iid_key: str):
        """Candidate-ranking evaluation (eval mode ``uniform N``): rank each
        user's positives among their sampled candidate list."""
        all_pos_index, all_pos_len = [], []
        predict = jax.jit(
            lambda p, users, cand: predict_fn(
                p,
                {
                    uid_key: jnp.repeat(users, cand.shape[1]),
                    iid_key: cand.reshape(-1),
                },
            ).reshape(cand.shape)
        )
        for users, cand, cand_mask, pos_mask, n_real in eval_batches:
            scores = predict(params, jnp.asarray(users), jnp.asarray(cand))
            k_eff = min(self.max_k, cand.shape[1])
            topk_idx = np.asarray(
                _candidate_topk(scores, jnp.asarray(cand_mask), k_eff)
            )
            for r in range(n_real):
                hits = pos_mask[r][topk_idx[r]]
                if k_eff < self.max_k:
                    hits = np.concatenate(
                        [hits, np.zeros(self.max_k - k_eff, dtype=bool)]
                    )
                all_pos_index.append(hits)
                all_pos_len.append(int(pos_mask[r].sum()))

        if not all_pos_index:
            return {f"{m}@{k}": 0.0 for m in self.metrics for k in self.topk}
        pos_index = np.stack(all_pos_index)
        pos_len = np.array(all_pos_len, dtype=np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.metrics, self.topk)
        return {k: round(v, self.decimal_place) for k, v in result.items()}
