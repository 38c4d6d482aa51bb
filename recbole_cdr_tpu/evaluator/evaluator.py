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

from recbole_cdr_tpu.evaluator.metrics import (
    NON_ACCURACY_METRICS,
    compute_non_accuracy_metrics,
    compute_topk_metrics,
    compute_value_metrics,
    gauc_,
)


def _apply_masks(scores: jnp.ndarray, hist: jnp.ndarray, hist_mask: jnp.ndarray):
    B = scores.shape[0]
    neg_inf = jnp.finfo(scores.dtype).min
    rows = jnp.arange(B)[:, None]
    # scatter -inf into history slots; padded slots point at column 0 which is
    # masked anyway (PAD item)
    safe_hist = jnp.where(hist_mask, hist, 0)
    scores = scores.at[rows, safe_hist].min(jnp.where(hist_mask, neg_inf, jnp.inf))
    scores = scores.at[:, 0].set(neg_inf)
    return scores


def _apply_masks_pairs(scores, hrows, hitems, hvalid):
    """History masking from a flat (row, item) pair list — the tail-robust
    form: a [B, H_max] padded matrix multiplies every user by the HEAVIEST
    user's degree (a single 10^4-interaction Amazon tail user would inflate
    it 20x+), while the pair list is exactly sum-of-degrees long."""
    neg_inf = jnp.finfo(scores.dtype).min
    safe_r = jnp.where(hvalid, hrows, 0)
    safe_i = jnp.where(hvalid, hitems, 0)
    scores = scores.at[safe_r, safe_i].min(
        jnp.where(hvalid, neg_inf, jnp.inf), mode="drop"
    )
    scores = scores.at[:, 0].set(neg_inf)
    return scores


@partial(jax.jit, static_argnames=("k",))
def _mask_and_topk(scores: jnp.ndarray, hist: jnp.ndarray, hist_mask: jnp.ndarray, k: int):
    """scores[B, I] -> top-k indices after masking history + PAD column."""
    scores = _apply_masks(scores, hist, hist_mask)
    _, topk_idx = jax.lax.top_k(scores, k)
    return topk_idx


def _pos_rank_sum(scores: jnp.ndarray, pos: jnp.ndarray, pos_mask: jnp.ndarray):
    """Sum of average descending ranks of each user's positives over their
    full (masked) score row — the recbole ``rec.meanrank`` statistic: rank of
    an item with score s = #{score > s} + (#{score == s} + 1)/2, ties
    averaged; history/PAD slots sit tied at -inf and count as negatives
    (recbole collects ranks from the already-masked score tensor)."""
    asc = jnp.sort(scores, axis=1)  # ascending
    I = scores.shape[1]
    rows = jnp.arange(scores.shape[0])[:, None]
    pos_scores = scores[rows, jnp.where(pos_mask, pos, 0)]
    left = jax.vmap(partial(jnp.searchsorted, side="left"))(asc, pos_scores)
    right = jax.vmap(partial(jnp.searchsorted, side="right"))(asc, pos_scores)
    n_greater = I - right
    n_tied = right - left
    avg_rank = n_greater.astype(scores.dtype) + (n_tied.astype(scores.dtype) + 1.0) / 2.0
    return jnp.where(pos_mask, avg_rank, 0.0).sum(axis=1)


@partial(jax.jit, static_argnames=("k",))
def _mask_topk_ranksum(scores, hist, hist_mask, pos, pos_mask, k: int):
    scores = _apply_masks(scores, hist, hist_mask)
    _, topk_idx = jax.lax.top_k(scores, k)
    return topk_idx, _pos_rank_sum(scores, pos, pos_mask)


@partial(jax.jit, static_argnames=("k",))
def _candidate_topk(scores: jnp.ndarray, cand_mask: jnp.ndarray, k: int):
    neg_inf = jnp.finfo(scores.dtype).min
    scores = jnp.where(cand_mask, scores, neg_inf)
    _, topk_idx = jax.lax.top_k(scores, k)
    return topk_idx


def _fused_eval_arrays(eval_batches, need_pos: bool, U_pad: int, B: int):
    """Device-resident eval operands, built once per (eval split, need_pos,
    padding): uids [U_pad], per-user-tile history PAIR lists
    (rows/items/valid, each [n_tiles, P]), and (for GAUC) positives
    [U_pad, P_pos] + mask. ``U_pad`` rounds the user axis up to a whole
    number of SEGMENTS so every dispatch reuses one compiled program (no
    remainder executable); ``B`` is the user-tile width the pair lists are
    grouped by.

    History is NOT stored [U_pad, max_hist]: a padded matrix scales with the
    heaviest user's degree (real Amazon/Douban tails reach 10^4+ interactions
    — the reference handles them as python sets,
    `crossdomain_sampler.py:229-250`), while the pair-list form is
    sum-of-degrees long. P = the heaviest TILE's pair count (tile pair
    ranges are contiguous in the CSR arrays since users are consecutive).
    GAUC positives stay [U_pad, P_pos]-padded: the rank-sum kernel needs
    row-aligned queries for its vmapped searchsorted, and P_pos is bounded
    by the largest TEST-split count (~10% of the heaviest degree — 20k-degree
    tails cost ~2k columns, hundreds of MB at worst, not the 20x history
    blow-up). Entries cache in a small dict keyed by (need_pos, U_pad, B).
    All id arrays are int32 — TPUs emulate 64-bit, which costs both compile
    time and HBM."""
    key = (need_pos, U_pad, B)
    cache = getattr(eval_batches, "_fused_arrays", None)
    if cache is None:
        cache = eval_batches._fused_arrays = {}
    if key in cache:
        return cache[key]
    U = len(eval_batches.uid_list)
    n_tiles = max(U_pad // B, 1)
    uids = np.zeros(U_pad, np.int32)
    uids[:U] = eval_batches.uid_list
    hp = eval_batches.hist_ptr
    bounds = np.minimum(np.arange(n_tiles + 1) * B, U)
    tile_starts, tile_ends = hp[bounds[:-1]], hp[bounds[1:]]
    P = max(int((tile_ends - tile_starts).max()) if n_tiles else 0, 1)
    hrows = np.zeros((n_tiles, P), np.int32)
    hitems = np.zeros((n_tiles, P), np.int32)
    hvalid = np.zeros((n_tiles, P), dtype=bool)
    if hp[-1] > 0:
        lens = np.diff(hp)
        owners = np.repeat(np.arange(U), lens)          # global row per pair
        pair_tile = owners // B
        pos_in_tile = np.arange(hp[-1]) - tile_starts[pair_tile]
        hrows[pair_tile, pos_in_tile] = owners % B
        hitems[pair_tile, pos_in_tile] = eval_batches.hist_items
        hvalid[pair_tile, pos_in_tile] = True
    arrs = [jnp.asarray(uids), jnp.asarray(hrows), jnp.asarray(hitems),
            jnp.asarray(hvalid)]
    if need_pos:
        P = max(int(eval_batches.pos_lens.max()) if U else 0, 1)
        pos = np.zeros((U_pad, P), np.int32)
        pmask = np.zeros((U_pad, P), dtype=bool)
        pp = eval_batches.pos_ptr
        if pp[-1] > 0:
            lens = eval_batches.pos_lens
            owners = np.repeat(np.arange(U), lens)
            pos_in_row = np.arange(pp[-1]) - np.repeat(pp[:-1], lens)
            pos[owners, pos_in_row] = eval_batches.pos_items
            pmask[owners, pos_in_row] = True
        arrs += [jnp.asarray(pos), jnp.asarray(pmask)]
    cache[key] = arrs
    return arrs


def _stream_eval_pairs(eval_batches, U_pad: int, B: int, item_tile: int):
    """uids [U_pad] + history pair lists partitioned by BOTH the user tile
    and the item tile: rows/items/valid each [n_utiles, n_itiles, P]. The
    streaming top-k's item-tile t then scatters only its own pairs (see
    ops/topk._stream_topk_hist_pairs). P = the heaviest (user tile, item
    tile) cell — tail users inflate one cell, not every row."""
    key = ("stream", U_pad, B, item_tile)
    cache = getattr(eval_batches, "_fused_arrays", None)
    if cache is None:
        cache = eval_batches._fused_arrays = {}
    if key in cache:
        return cache[key]
    U = len(eval_batches.uid_list)
    n_ut = max(U_pad // B, 1)
    n_it = -(-eval_batches.item_num // item_tile)
    uids = np.zeros(U_pad, np.int32)
    uids[:U] = eval_batches.uid_list
    hp = eval_batches.hist_ptr
    total = int(hp[-1])
    lens = np.diff(hp)
    owners = np.repeat(np.arange(U), lens)
    items = np.asarray(eval_batches.hist_items)
    cell = (owners // B) * n_it + items // item_tile
    order = np.argsort(cell, kind="stable")
    sk = cell[order]
    counts = np.bincount(sk, minlength=n_ut * n_it) if total else \
        np.zeros(n_ut * n_it, np.int64)
    P = max(int(counts.max()) if total else 0, 1)
    hrows = np.zeros((n_ut * n_it, P), np.int32)
    hitems = np.zeros((n_ut * n_it, P), np.int32)
    hvalid = np.zeros((n_ut * n_it, P), dtype=bool)
    if total:
        starts = np.concatenate([[0], np.cumsum(counts)])
        pos = np.arange(total) - starts[sk]
        hrows[sk, pos] = owners[order] % B
        hitems[sk, pos] = items[order]
        hvalid[sk, pos] = True
    arrs = [
        jnp.asarray(uids),
        jnp.asarray(hrows.reshape(n_ut, n_it, P)),
        jnp.asarray(hitems.reshape(n_ut, n_it, P)),
        jnp.asarray(hvalid.reshape(n_ut, n_it, P)),
    ]
    cache[key] = arrs
    return arrs


class FullSortEvaluator:
    """Evaluate a model's full-sort ranking quality over eval batches."""

    def __init__(self, config):
        self.metrics = [m.lower() for m in config["metrics"]]
        self.non_acc_metrics = [m for m in self.metrics if m in NON_ACCURACY_METRICS]
        self.topk_metrics = [
            m for m in self.metrics
            if m != "gauc" and m not in NON_ACCURACY_METRICS
        ]
        self.need_gauc = "gauc" in self.metrics
        self.need_rec_items = bool(self.non_acc_metrics)
        self.tail_ratio = config["tail_ratio"] or 0.1
        self.topk = config["topk"]
        self.max_k = max(self.topk)
        self.decimal_place = config["metric_decimal_place"] or 4
        # eval_score_dtype: 'bfloat16' casts the streaming path's score
        # factors before the tiled matmul (half the item-table HBM reads,
        # 2x MXU rate); accumulation/top-k stay f32 (ops/topk._score_dot)
        sd = config["eval_score_dtype"]
        self.score_dtype = jnp.dtype(sd) if sd else None
        self._fused_fns = {}

    def _empty_result(self) -> Dict[str, float]:
        out = {f"{m}@{k}": 0.0 for m in self.topk_metrics for k in self.topk}
        out.update({f"{m}@{k}": 0.0 for m in self.non_acc_metrics for k in self.topk})
        if self.need_gauc:
            out["gauc"] = 0.0
        return out

    def _add_non_accuracy(self, result, all_rec_items, eval_batches, item_num):
        """Append ItemCoverage/AveragePopularity/GiniIndex/ShannonEntropy/
        TailPercentage computed from the recommended item-id matrix."""
        if not self.need_rec_items:
            return result
        rec_items = np.concatenate(all_rec_items, axis=0)
        counts = getattr(eval_batches, "train_item_counts", None)
        if counts is None:
            if {"averagepopularity", "tailpercentage"} & set(self.non_acc_metrics):
                raise ValueError(
                    "AveragePopularity/TailPercentage need train item counts "
                    "(eval_batches.train_item_counts missing)"
                )
            counts = np.zeros(item_num, np.int64)
        result.update(
            compute_non_accuracy_metrics(
                rec_items, counts, item_num, self.non_acc_metrics,
                self.topk, self.tail_ratio,
            )
        )
        return result

    def _padded_positives(self, eval_batches, start: int, B: int):
        """Positives of users [start, start+B) padded to a static width.
        CSR->padded fill vectorized as one scatter (same machinery as
        FullSortEvalBatches.__iter__)."""
        pos_lens = eval_batches.pos_lens
        n = min(B, len(pos_lens) - start)
        lens = pos_lens[start:start + n]
        P = max(int(lens.max()) if n else 0, 1)
        pos = np.zeros((B, P), dtype=np.int64)
        mask = np.zeros((B, P), dtype=bool)
        ptr = eval_batches.pos_ptr
        lo, hi = ptr[start], ptr[start + n] if n else ptr[start]
        if hi > lo:
            owners = np.repeat(np.arange(n), lens)
            pos_in_row = np.arange(hi - lo) - np.repeat(ptr[start:start + n] - lo, lens)
            pos[owners, pos_in_row] = eval_batches.pos_items[lo:hi]
            mask[owners, pos_in_row] = True
        return pos, mask

    def _fused_program(self, score_fn, B: int, seg_tiles: int, with_gauc: bool):
        """One jitted program scoring ``seg_tiles`` user tiles per dispatch:
        a ``lax.scan`` over tiles (score -> mask -> top-k [-> rank sums])
        starting at the DYNAMIC tile offset ``tile0`` — every full segment of
        an eval pass reuses this single executable. Only the [seg*B, k] top-k
        ids (+ rank sums) leave the device per dispatch. The per-batch loop
        in :meth:`evaluate` issued 2 dispatches + transfers per ~B users
        through the chip tunnel (26,940 Amazon users = 122 round-trips);
        NB the scan wrapper also sidesteps an XLA pathology where the
        standalone [B, 150k+] mask+top-k program takes ~220s to compile
        (measured on v5e) vs ~11s inside a scan."""
        key = (score_fn, B, seg_tiles, with_gauc, self.max_k)
        fn = self._fused_fns.get(key)
        if fn is not None:
            return fn
        k = self.max_k

        def _tile_pairs(arr, t):
            return jax.lax.dynamic_slice_in_dim(arr, t, 1, 0)[0]

        @jax.jit
        def run_topk(params, tile0, uids, hrows, hitems, hvalid):
            def body(_, i):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, (tile0 + i) * B, B, 0)
                t = tile0 + i
                scores = _apply_masks_pairs(
                    score_fn(params, sl(uids)), _tile_pairs(hrows, t),
                    _tile_pairs(hitems, t), _tile_pairs(hvalid, t),
                )
                return None, jax.lax.top_k(scores, k)[1]

            _, topk = jax.lax.scan(body, None, jnp.arange(seg_tiles))
            return topk.reshape(seg_tiles * B, k)

        @jax.jit
        def run_topk_ranksum(params, tile0, uids, hrows, hitems, hvalid,
                             pos, pos_mask):
            def body(_, i):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, (tile0 + i) * B, B, 0)
                t = tile0 + i
                scores = _apply_masks_pairs(
                    score_fn(params, sl(uids)), _tile_pairs(hrows, t),
                    _tile_pairs(hitems, t), _tile_pairs(hvalid, t),
                )
                rs = _pos_rank_sum(scores, sl(pos), sl(pos_mask))
                return None, (jax.lax.top_k(scores, k)[1], rs)

            _, (topk, rs) = jax.lax.scan(body, None, jnp.arange(seg_tiles))
            return topk.reshape(seg_tiles * B, k), rs.reshape(seg_tiles * B)

        fn = run_topk_ranksum if with_gauc else run_topk
        self._fused_fns[key] = fn
        return fn

    @staticmethod
    def _segmentation(eval_batches, elems_budget, B=None):
        """(seg_tiles, n_segments): tile count per dispatch bounded by
        ``elems_budget`` score elements (bounds single-dispatch device time —
        one unbounded dispatch at 150k+ items ran minutes and tripped the
        TPU worker watchdog). The user axis pads to n_segments whole
        segments so ONE compiled program serves every dispatch."""
        U = len(eval_batches.uid_list)
        if B is None:
            B = eval_batches.user_batch
        n_tiles = -(-U // B)
        seg = max(1, min(n_tiles, elems_budget // max(B * eval_batches.item_num, 1)))
        return seg, -(-n_tiles // seg)

    #: per-dispatch budget of score-matrix elements for the fused dense eval.
    #: Raced on the real chip at 153k items (round 5): 2048-row user blocks
    #: need the full block in one dispatch (2^29 elems ~= 2 GB f32 score
    #: traffic, ~0.1 s device time — far under the watchdog); halving the
    #: budget at the same block measured slower purely from dispatch count
    DENSE_SEG_ELEMS = 1 << 29

    #: minimum user rows per dense tile. eval_batch_size's implied user batch
    #: (26 rows at Book-Crossing's 4,096,000 elements / 153k items) runs the
    #: scoring matmul at <2% MXU utilization (VERDICT r4 weak #1); the fused
    #: dense path re-blocks users to at least this many rows per tile (results
    #: are row-independent, so re-blocking cannot change metrics), bounded so
    #: one tile's [B, I] score matrix stays within the dispatch element budget.
    DENSE_USER_BLOCK = 2048

    #: per-dispatch element budget for PAIR-COST scorers (predict-fallback
    #: models like NATR: each score element is a full predict() — a 50-row
    #: attention, ~50x the flops of a matmul element). An element-budgeted
    #: dispatch sized for matmuls runs minutes there and trips the TPU
    #: worker watchdog (observed at the Amazon shape).
    HEAVY_SEG_ELEMS = 1 << 23

    def _dense_budget(self, score_fn, eval_batches):
        """(user-block rows, per-dispatch element budget) for the fused
        dense path, by scorer cost class."""
        U = len(eval_batches.uid_list)
        if getattr(score_fn, "_pair_cost", False):
            return eval_batches.user_batch, self.HEAVY_SEG_ELEMS
        cap = max(self.DENSE_SEG_ELEMS // max(eval_batches.item_num, 1), 1)
        B = max(eval_batches.user_batch, min(self.DENSE_USER_BLOCK, U, cap))
        return B, self.DENSE_SEG_ELEMS

    def _evaluate_fused(self, score_fn, params, eval_batches) -> Dict[str, float]:
        U = len(eval_batches.uid_list)
        B, budget = self._dense_budget(score_fn, eval_batches)
        seg, n_segs = self._segmentation(eval_batches, budget, B)
        arrs = _fused_eval_arrays(eval_batches, self.need_gauc, seg * n_segs * B, B)
        fn = self._fused_program(score_fn, B, seg, self.need_gauc)
        outs = [fn(params, jnp.int32(s * seg), *arrs) for s in range(n_segs)]
        if self.need_gauc:
            topk_idx = np.concatenate([np.asarray(o[0]) for o in outs])[:U]
            rank_sum = np.concatenate([np.asarray(o[1]) for o in outs])[:U]
        else:
            topk_idx = np.concatenate([np.asarray(o) for o in outs])[:U]

        item_num = eval_batches.item_num
        pos_keys = eval_batches.pos_keys_sorted
        owners = np.arange(U, dtype=np.int64)[:, None]
        q = owners * item_num + topk_idx
        loc = np.searchsorted(pos_keys, q)
        loc = np.minimum(loc, max(len(pos_keys) - 1, 0))
        pos_index = pos_keys[loc] == q if len(pos_keys) else np.zeros_like(q, bool)
        pos_len = eval_batches.pos_lens.astype(np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.topk_metrics, self.topk)
        if self.need_gauc:
            user_len = np.full(U, item_num, dtype=np.int64)
            result["gauc"] = gauc_(user_len, pos_len, rank_sum)
        result = self._add_non_accuracy(result, [topk_idx], eval_batches, item_num)
        return {k: round(v, self.decimal_place) for k, v in result.items()}

    def evaluate(self, score_fn, params, eval_batches, item_num=None) -> Dict[str, float]:
        """Args:
            score_fn: ``(params, user_ids[B]) -> scores[B, item_num]`` (jitted).
            eval_batches: a :class:`FullSortEvalBatches`.
        Returns {metric@k: value} averaged over users (plus ``gauc`` when
        requested — computed from full-row average ranks, SURVEY §5 metric set).

        Traceable score fns on a single host take the fused device path (one
        dispatch per eval pass); non-traceable scorers (``_no_jit``, e.g. the
        torch parity oracle) and multi-host runs use the per-batch loop
        (multi-host needs per-fn replicated out-shardings the caller owns).
        """
        if (len(eval_batches.uid_list)
                and not getattr(score_fn, "_no_jit", False)
                and jax.process_count() == 1):
            return self._evaluate_fused(score_fn, params, eval_batches)
        all_pos_index = []
        all_pos_len = []
        all_rank_sum = []
        all_rec_items = []
        user_offset = 0
        pos_keys = eval_batches.pos_keys_sorted
        item_num = eval_batches.item_num
        for uids, hist, hist_mask, n_real in eval_batches:
            scores = score_fn(params, jnp.asarray(uids))
            if self.need_gauc:
                pos, pos_mask = self._padded_positives(
                    eval_batches, user_offset, len(uids)
                )
                topk_idx, rank_sum = _mask_topk_ranksum(
                    scores, jnp.asarray(hist), jnp.asarray(hist_mask),
                    jnp.asarray(pos), jnp.asarray(pos_mask), self.max_k,
                )
                all_rank_sum.append(np.asarray(rank_sum)[:n_real])
            else:
                topk_idx = _mask_and_topk(
                    scores, jnp.asarray(hist), jnp.asarray(hist_mask), self.max_k
                )
            topk_idx = np.asarray(topk_idx)[:n_real]
            if self.need_rec_items:
                all_rec_items.append(topk_idx)  # columns ARE item ids here
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
            return self._empty_result()
        pos_index = np.concatenate(all_pos_index, axis=0)
        pos_len = np.concatenate(all_pos_len).astype(np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.topk_metrics, self.topk)
        if self.need_gauc:
            rank_sum = np.concatenate(all_rank_sum)
            user_len = np.full(len(pos_len), item_num, dtype=np.int64)
            result["gauc"] = gauc_(user_len, pos_len, rank_sum)
        result = self._add_non_accuracy(result, all_rec_items, eval_batches, item_num)
        return {k: round(v, self.decimal_place) for k, v in result.items()}

    #: per-dispatch element budget for the fused streaming eval — the reworked
    #: streaming kernel (per-tile top-k + one final merge, scatter masking)
    #: costs about the same per score element as the dense path, so it shares
    #: the dense budget
    STREAM_SEG_ELEMS = 1 << 28

    #: minimum user rows per streaming tile. Streaming memory is
    #: O(B * item_tile), NOT O(B * item_num), so eval_batch_size's implied
    #: user_batch (26 rows at Book-Crossing's 4,096,000 eval elements / 153k
    #: items) would starve the MXU for no memory benefit. Raced on the real
    #: chip at 153k items (round 5): 256 -> 39.7k users/s, 512 -> 43.9k,
    #: 2048 -> 49.0k (best), 4096 -> 43.6k; 1024 hits a consistent XLA
    #: scheduling dip (25.5k across reps).
    STREAM_USER_BLOCK = 2048

    #: item-axis tile width of the streaming top-k (raced on a real v5e at
    #: 153k items: 8k -> 20.5k users/s, 16k -> 26.6k, 32k -> 30.1k; dense
    #: 34.6k — results/step_breakdown.md)
    STREAM_ITEM_TILE = 32768

    def _evaluate_streaming_fused(self, factors_fn, params, eval_batches):
        """Streaming top-k over user tiles, fused into segment-bounded
        dispatches (same scheme as :meth:`_evaluate_fused`); the item table is
        computed once outside the tile scan (it does not depend on the user
        tile — the per-tile copy inside the body is dead-code-eliminated).
        History arrives as per-tile pair lists (tail-robust, see
        :func:`_fused_eval_arrays`)."""
        from recbole_cdr_tpu.ops.topk import _stream_topk_hist_pairs

        U = len(eval_batches.uid_list)
        B = max(eval_batches.user_batch, min(self.STREAM_USER_BLOCK, U))
        item_num = eval_batches.item_num
        n_tiles = -(-U // B)
        seg = max(1, min(n_tiles, self.STREAM_SEG_ELEMS // max(B * item_num, 1)))
        n_segs = -(-n_tiles // seg)
        uids_d, hrows_d, hitems_d, hvalid_d = _stream_eval_pairs(
            eval_batches, seg * n_segs * B, B, self.STREAM_ITEM_TILE
        )
        k = self.max_k

        sd = self.score_dtype

        def make(seg_tiles):
            key = (factors_fn, B, seg_tiles, "streaming", k, sd)
            run = self._fused_fns.get(key)
            if run is not None:
                return run

            @jax.jit
            def run(params, tile0, uids, hrows, hitems, hvalid):
                _, item_table = factors_fn(params, uids[:B])
                if sd is not None:
                    item_table = item_table.astype(sd)

                def body(_, i):
                    t = tile0 + i
                    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, t * B, B, 0)
                    pr = lambda a: jax.lax.dynamic_slice_in_dim(a, t, 1, 0)[0]
                    user_e, _ = factors_fn(params, sl(uids))
                    if sd is not None:
                        user_e = user_e.astype(sd)
                    _, topk = _stream_topk_hist_pairs(
                        user_e, item_table, pr(hrows), pr(hitems), pr(hvalid),
                        k, self.STREAM_ITEM_TILE, 0, item_table.shape[0],
                    )
                    return None, topk

                _, topk = jax.lax.scan(body, None, jnp.arange(seg_tiles))
                return topk.reshape(seg_tiles * B, k)

            self._fused_fns[key] = run
            return run

        fn = make(seg)
        outs = [
            fn(params, jnp.int32(s * seg), uids_d, hrows_d, hitems_d, hvalid_d)
            for s in range(n_segs)
        ]
        topk_idx = np.concatenate([np.asarray(o) for o in outs], axis=0)[:U]
        pos_keys = eval_batches.pos_keys_sorted
        owners = np.arange(U, dtype=np.int64)[:, None]
        q = owners * item_num + topk_idx
        loc = np.searchsorted(pos_keys, q)
        loc = np.minimum(loc, max(len(pos_keys) - 1, 0))
        pos_index = pos_keys[loc] == q if len(pos_keys) else np.zeros_like(q, bool)
        pos_len = eval_batches.pos_lens.astype(np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.topk_metrics, self.topk)
        result = self._add_non_accuracy(result, [topk_idx], eval_batches, item_num)
        return {k: round(v, self.decimal_place) for k, v in result.items()}

    def evaluate_streaming(self, factors_fn, params, eval_batches, mesh=None):
        """Full-sort evaluation via streaming tiled top-k — the [B, items]
        score matrix never materializes (ops/topk.py). Used for large item
        spaces when the model's full-sort is a dot product. With ``mesh``,
        the item axis is sharded over 'model' and the user batch over 'data'
        (local top-k per shard, all_gather merge — SURVEY §2.3/§5's
        block-wise full-sort). GAUC needs full rank statistics — callers
        route to :meth:`evaluate` instead."""
        if self.need_gauc:
            raise ValueError("GAUC requires dense full-sort evaluation, not streaming.")
        from recbole_cdr_tpu.ops.topk import (
            make_sharded_streaming_topk,
            streaming_topk_with_history,
        )

        if (mesh is None and len(eval_batches.uid_list)
                and not getattr(factors_fn, "_no_jit", False)
                and jax.process_count() == 1):
            return self._evaluate_streaming_fused(factors_fn, params, eval_batches)
        if mesh is not None:
            sharded_topk = make_sharded_streaming_topk(mesh, self.max_k)
        factors = (
            factors_fn if getattr(factors_fn, "_no_jit", False)
            else jax.jit(factors_fn)
        )
        all_pos_index, all_pos_len = [], []
        all_rec_items = []
        user_offset = 0
        pos_keys = eval_batches.pos_keys_sorted
        item_num = eval_batches.item_num
        for uids, hist, hist_mask, n_real in eval_batches:
            user_e, item_table = factors(params, jnp.asarray(uids))
            if self.score_dtype is not None:
                user_e = user_e.astype(self.score_dtype)
                item_table = item_table.astype(self.score_dtype)
            hist_ids = jnp.where(
                jnp.asarray(hist_mask), jnp.asarray(hist), item_num
            )
            if mesh is not None:
                _, topk_idx = sharded_topk(user_e, item_table, hist_ids)
            else:
                _, topk_idx = streaming_topk_with_history(
                    user_e, item_table, hist_ids, self.max_k
                )
            topk_idx = np.asarray(topk_idx)[:n_real]
            if self.need_rec_items:
                all_rec_items.append(topk_idx)
            owners = (user_offset + np.arange(n_real, dtype=np.int64))[:, None]
            q = owners * item_num + topk_idx
            loc = np.searchsorted(pos_keys, q)
            loc = np.minimum(loc, max(len(pos_keys) - 1, 0))
            hits = pos_keys[loc] == q if len(pos_keys) else np.zeros_like(q, bool)
            all_pos_index.append(hits)
            all_pos_len.append(eval_batches.pos_lens[user_offset:user_offset + n_real])
            user_offset += n_real

        if not all_pos_index:
            return self._empty_result()
        pos_index = np.concatenate(all_pos_index, axis=0)
        pos_len = np.concatenate(all_pos_len).astype(np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.topk_metrics, self.topk)
        result = self._add_non_accuracy(result, all_rec_items, eval_batches, item_num)
        return {k: round(v, self.decimal_place) for k, v in result.items()}

    def evaluate_candidates(self, predict_fn, params, eval_batches,
                            uid_key: str, iid_key: str):
        """Candidate-ranking evaluation (eval mode ``uniform N``): rank each
        user's positives among their sampled candidate list."""
        all_pos_index, all_pos_len = [], []

        def _predict(p, users, cand):
            return predict_fn(
                p,
                {
                    uid_key: jnp.repeat(users, cand.shape[1]),
                    iid_key: cand.reshape(-1),
                },
            ).reshape(cand.shape)

        predict = (
            _predict if getattr(predict_fn, "_no_jit", False) else jax.jit(_predict)
        )
        all_rank_sum, all_user_len = [], []
        all_rec_items = []
        for users, cand, cand_mask, pos_mask, n_real in eval_batches:
            scores = predict(params, jnp.asarray(users), jnp.asarray(cand))
            k_eff = min(self.max_k, cand.shape[1])
            topk_idx = np.asarray(
                _candidate_topk(scores, jnp.asarray(cand_mask), k_eff)
            )
            if self.need_rec_items:
                # positions -> actual item ids; ranks beyond the candidate
                # count pad with PAD id 0
                ids = np.take_along_axis(cand[:n_real], topk_idx[:n_real], axis=1)
                if k_eff < self.max_k:
                    ids = np.concatenate(
                        [ids, np.zeros((ids.shape[0], self.max_k - k_eff), ids.dtype)],
                        axis=1,
                    )
                all_rec_items.append(ids)
            if self.need_gauc:
                # ranks among each user's real candidates (average tie ranks);
                # padded slots sit at -inf below every real candidate, so the
                # rank of a real candidate is unaffected — subtracting nothing
                masked = np.where(cand_mask, np.asarray(scores), -np.inf)
                cols = np.broadcast_to(
                    np.arange(cand.shape[1]), cand.shape
                ).copy()
                rs = np.asarray(
                    _pos_rank_sum(
                        jnp.asarray(masked), jnp.asarray(cols), jnp.asarray(pos_mask)
                    )
                )
                all_rank_sum.extend(rs[:n_real])
                all_user_len.extend(cand_mask[:n_real].sum(axis=1))
            hits = np.take_along_axis(pos_mask[:n_real], topk_idx[:n_real], axis=1)
            if k_eff < self.max_k:
                hits = np.concatenate(
                    [hits, np.zeros((n_real, self.max_k - k_eff), dtype=bool)], axis=1
                )
            all_pos_index.append(hits)
            all_pos_len.append(pos_mask[:n_real].sum(axis=1))

        if not all_pos_index:
            return self._empty_result()
        pos_index = np.concatenate(all_pos_index, axis=0)
        pos_len = np.concatenate(all_pos_len).astype(np.int64)
        result = compute_topk_metrics(pos_index, pos_len, self.topk_metrics, self.topk)
        if self.need_gauc:
            result["gauc"] = gauc_(
                np.array(all_user_len, np.int64), pos_len, np.array(all_rank_sum)
            )
        result = self._add_non_accuracy(
            result, all_rec_items, eval_batches, eval_batches.item_num
        )
        return {k: round(v, self.decimal_place) for k, v in result.items()}


class ValueEvaluator:
    """Value-metric evaluation over labeled (user, item, label) triples —
    the recbole 1.0.1 ``eval_args mode: labeled`` path (AUC / MAE / RMSE /
    LogLoss, pooled over the whole eval split)."""

    def __init__(self, config):
        self.metrics = [m.lower() for m in config["metrics"]]
        self.decimal_place = config["metric_decimal_place"] or 4

    def evaluate(self, predict_fn, params, eval_batches, uid_key: str,
                 iid_key: str) -> Dict[str, float]:
        def _predict(p, users, items):
            return predict_fn(p, {uid_key: users, iid_key: items})

        predict = (
            _predict if getattr(predict_fn, "_no_jit", False) else jax.jit(_predict)
        )
        preds, trues = [], []
        for users, items, labels, n_real in eval_batches:
            out = np.asarray(predict(params, jnp.asarray(users), jnp.asarray(items)))
            preds.append(out[:n_real])
            trues.append(labels[:n_real])
        if not preds:
            return {m: 0.0 for m in self.metrics}
        result = compute_value_metrics(
            np.concatenate(trues), np.concatenate(preds), self.metrics
        )
        return {k: round(v, self.decimal_place) for k, v in result.items()}
