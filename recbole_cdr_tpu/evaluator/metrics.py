"""Ranking + value metrics, numerically identical to recbole 1.0.1's definitions.

Top-k ranking metrics consume:
- ``pos_index``: bool [n_users, max_k] — whether the i-th ranked item is a
  positive (ground-truth) item
- ``pos_len``: int [n_users] — number of ground-truth items per user

and return a [n_users, max_k] matrix whose column ``k-1`` is the metric@k.

Value metrics (AUC / MAE / RMSE / LogLoss) consume pooled ``(trues, preds)``
arrays over the whole eval split; GAUC consumes per-user rank statistics
(the recbole ``rec.meanrank`` collector data).
"""

from logging import getLogger
from typing import Dict, List

import numpy as np


def hit_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    result = np.cumsum(pos_index, axis=1)
    return (result > 0).astype(int)


def mrr_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    idxs = pos_index.argmax(axis=1)
    has_hit = pos_index[np.arange(pos_index.shape[0]), idxs] > 0
    vals = np.where(has_hit, 1.0 / (idxs + 1.0), 0.0)
    cols = np.arange(pos_index.shape[1])[None, :]
    return np.where(cols >= idxs[:, None], vals[:, None], 0.0)


def recall_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    return np.cumsum(pos_index, axis=1) / pos_len.reshape(-1, 1)


def ndcg_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    len_rank = np.full_like(pos_len, pos_index.shape[1])
    idcg_len = np.where(pos_len > len_rank, len_rank, pos_len)

    iranks = np.zeros_like(pos_index, dtype=np.float64)
    iranks[:, :] = np.arange(1, pos_index.shape[1] + 1)
    idcg = np.cumsum(1.0 / np.log2(iranks + 1), axis=1)
    # freeze idcg past each user's positive count (idx-1 = -1 for zero-positive
    # users wraps to the last column — recbole's python-slice behavior)
    fill = idcg[np.arange(idcg.shape[0]), idcg_len - 1]
    cols = np.arange(pos_index.shape[1])[None, :]
    idcg = np.where(cols >= idcg_len[:, None], fill[:, None], idcg)

    ranks = np.zeros_like(pos_index, dtype=np.float64)
    ranks[:, :] = np.arange(1, pos_index.shape[1] + 1)
    dcg = 1.0 / np.log2(ranks + 1)
    dcg = np.cumsum(np.where(pos_index, dcg, 0), axis=1)
    return dcg / idcg


def precision_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    return pos_index.cumsum(axis=1) / np.arange(1, pos_index.shape[1] + 1)


def map_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    pre = pos_index.cumsum(axis=1) / np.arange(1, pos_index.shape[1] + 1)
    sum_pre = np.cumsum(pre * pos_index.astype(np.float64), axis=1)
    len_rank = np.full_like(pos_len, pos_index.shape[1])
    actual_len = np.where(pos_len > len_rank, len_rank, pos_len)
    K = pos_index.shape[1]
    pos = np.arange(1, K + 1, dtype=np.float64)[None, :]
    # denominator clamps at each user's positive count; zero-positive users
    # clamp at ranges[-1] = K (recbole's python-slice behavior)
    fill = np.where(actual_len > 0, actual_len, K).astype(np.float64)[:, None]
    denom = np.where(np.arange(K)[None, :] < actual_len[:, None], pos, fill)
    return sum_pre / denom


METRIC_FNS = {
    "hit": hit_,
    "mrr": mrr_,
    "recall": recall_,
    "ndcg": ndcg_,
    "precision": precision_,
    "map": map_,
}


# ----------------------------------------------------------- value metrics
# recbole 1.0.1 pools predictions/labels across the whole eval split and
# computes one scalar per metric (no @k suffix).


def auc_(trues: np.ndarray, preds: np.ndarray) -> float:
    """Pooled ROC AUC with average tie ranks — identical to the trapezoidal
    ROC integral recbole computes via its ``_binary_clf_curve``."""
    trues = np.asarray(trues, dtype=np.float64)
    preds = np.asarray(preds, dtype=np.float64)
    n_pos = float(trues.sum())
    n_neg = float(len(trues) - trues.sum())
    if n_pos <= 0 or n_neg <= 0:
        getLogger().warning(
            "No positive or no negative samples in AUC evaluation; return 0."
        )
        return 0.0
    order = np.argsort(preds, kind="mergesort")
    sorted_preds = preds[order]
    # average rank for ties: rank range [left+1, right] -> (left+right+1)/2
    left = np.searchsorted(sorted_preds, preds, side="left").astype(np.float64)
    right = np.searchsorted(sorted_preds, preds, side="right").astype(np.float64)
    ranks = (left + right + 1.0) / 2.0
    pos_rank_sum = float(ranks[trues > 0.5].sum())
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def mae_(trues: np.ndarray, preds: np.ndarray) -> float:
    return float(np.mean(np.abs(np.asarray(trues, np.float64) - np.asarray(preds, np.float64))))


def rmse_(trues: np.ndarray, preds: np.ndarray) -> float:
    diff = np.asarray(trues, np.float64) - np.asarray(preds, np.float64)
    return float(np.sqrt(np.mean(diff * diff)))


def logloss_(trues: np.ndarray, preds: np.ndarray) -> float:
    """recbole ``log_loss_``: clip to (eps, 1-eps), mean binary cross-entropy."""
    eps = 1e-15
    trues = np.asarray(trues, np.float64)
    preds = np.clip(np.asarray(preds, np.float64), eps, 1.0 - eps)
    loss = np.sum(-trues * np.log(preds) - (1.0 - trues) * np.log(1.0 - preds))
    return float(loss / len(preds))


VALUE_METRIC_FNS = {
    "auc": auc_,
    "mae": mae_,
    "rmse": rmse_,
    "logloss": logloss_,
}


def compute_value_metrics(
    trues: np.ndarray, preds: np.ndarray, metrics: List[str]
) -> Dict[str, float]:
    return {
        m.lower(): round(float(VALUE_METRIC_FNS[m.lower()](trues, preds)), 10)
        for m in metrics
        if m.lower() in VALUE_METRIC_FNS
    }


def gauc_(
    user_len_list: np.ndarray, pos_len_list: np.ndarray, pos_rank_sum: np.ndarray
) -> float:
    """Group-averaged AUC, recbole 1.0.1 ``gauc_`` semantics: per-user AUC
    from the average-rank sum of that user's positives (ranks computed over
    the full masked score row, ties averaged), weighted by the user's
    positive count. Users with zero positives or zero negatives are dropped
    with a warning."""
    user_len_list = np.asarray(user_len_list, np.float64)
    pos_len_list = np.asarray(pos_len_list, np.float64)
    pos_rank_sum = np.asarray(pos_rank_sum, np.float64)
    neg_len_list = user_len_list - pos_len_list
    keep = np.ones(len(user_len_list), dtype=bool)
    if np.any(pos_len_list == 0):
        getLogger().warning(
            "No positive samples in some users; those users are dropped from GAUC."
        )
        keep &= pos_len_list != 0
    if np.any(neg_len_list == 0):
        getLogger().warning(
            "No negative samples in some users; those users are dropped from GAUC."
        )
        keep &= neg_len_list != 0
    user_len_list, pos_len_list = user_len_list[keep], pos_len_list[keep]
    neg_len_list, pos_rank_sum = neg_len_list[keep], pos_rank_sum[keep]
    if len(pos_len_list) == 0 or pos_len_list.sum() == 0:
        return 0.0
    # ranks are descending (rank 1 = best); #correctly-ordered pairs per user:
    pair_num = (
        (user_len_list + 1.0) * pos_len_list
        - pos_len_list * (pos_len_list + 1.0) / 2.0
        - pos_rank_sum
    )
    user_auc = pair_num / (neg_len_list * pos_len_list)
    return float((user_auc * pos_len_list).sum() / pos_len_list.sum())


# ----------------------------------------------------- non-accuracy metrics
# recbole 1.0.1 diversity/popularity metrics over the recommended item-id
# matrix ``rec_items`` [n_users, max_k] plus per-item train-interaction
# counts (the ``data.count_items`` Counter) and the item-space size
# (``data.num_items``, PAD included — recbole counts it in the denominator).

NON_ACCURACY_METRICS = {
    "itemcoverage",
    "averagepopularity",
    "giniindex",
    "shannonentropy",
    "tailpercentage",
}


def item_coverage_(rec_items: np.ndarray, num_items: int) -> float:
    """Fraction of the item space ever recommended (recbole get_coverage)."""
    return np.unique(rec_items).shape[0] / num_items


def gini_index_(rec_items: np.ndarray, num_items: int) -> float:
    """Gini index of the recommendation-frequency distribution, with every
    never-recommended item counted as frequency 0 (recbole get_gini)."""
    counts = np.bincount(rec_items.reshape(-1))
    sorted_count = np.sort(counts[counts > 0])
    n_rec = sorted_count.shape[0]
    total_num = rec_items.shape[0] * rec_items.shape[1]
    idx = np.arange(num_items - n_rec + 1, num_items + 1)
    gini = np.sum((2 * idx - num_items - 1) * sorted_count) / total_num
    return float(gini / num_items)


def shannon_entropy_(rec_items: np.ndarray) -> float:
    """Mean per-recommended-item entropy contribution (recbole get_entropy:
    entropy of the rec distribution divided by #distinct recommended items)."""
    counts = np.bincount(rec_items.reshape(-1))
    counts = counts[counts > 0]
    total_num = rec_items.shape[0] * rec_items.shape[1]
    p = counts / total_num
    return float(np.sum(-p * np.log(p)) / len(counts))


def _per_position_mean(values: np.ndarray) -> np.ndarray:
    """[n_users, max_k] -> running mean over ranks (recbole metric_info for
    AveragePopularity / TailPercentage)."""
    return values.cumsum(axis=1) / np.arange(1, values.shape[1] + 1)


def average_popularity_(rec_items: np.ndarray, item_counts: np.ndarray) -> np.ndarray:
    """Per-user running mean of recommended items' train popularity;
    unseen-in-train items count 0 (recbole get_pop)."""
    counts = np.zeros(max(item_counts.shape[0], rec_items.max() + 1), np.float64)
    counts[: item_counts.shape[0]] = item_counts
    return _per_position_mean(counts[rec_items])


def tail_percentage_(
    rec_items: np.ndarray, item_counts: np.ndarray, tail_ratio: float
) -> np.ndarray:
    """Per-user running fraction of recommended items that are tail items.
    ``tail_ratio <= 1``: the least-popular ratio of items **that appear in
    train** (recbole sorts the count_items dict, which has no zero-count
    entries); ``> 1``: items with train count <= tail_ratio."""
    if tail_ratio > 1:
        seen = np.nonzero(item_counts)[0]
        tail_items = seen[item_counts[seen] <= tail_ratio]
    else:
        seen = np.nonzero(item_counts)[0]
        order = np.argsort(item_counts[seen], kind="stable")
        cut = max(int(len(seen) * tail_ratio), 1)
        tail_items = seen[order[:cut]]
    is_tail = np.zeros(max(item_counts.shape[0], rec_items.max() + 1), bool)
    is_tail[tail_items] = True
    return _per_position_mean(is_tail[rec_items].astype(np.float64))


def compute_non_accuracy_metrics(
    rec_items: np.ndarray,
    item_counts: np.ndarray,
    num_items: int,
    metrics: List[str],
    topk: List[int],
    tail_ratio: float = 0.1,
) -> Dict[str, float]:
    """rec_items: int [n_users, max_k] recommended item ids; item_counts:
    float/int [num_items] train-interaction count per item id."""
    out: Dict[str, float] = {}
    for m in metrics:
        m = m.lower()
        if m == "itemcoverage":
            for k in topk:
                out[f"{m}@{k}"] = float(item_coverage_(rec_items[:, :k], num_items))
        elif m == "giniindex":
            for k in topk:
                out[f"{m}@{k}"] = gini_index_(rec_items[:, :k], num_items)
        elif m == "shannonentropy":
            for k in topk:
                out[f"{m}@{k}"] = shannon_entropy_(rec_items[:, :k])
        elif m == "averagepopularity":
            per_pos = average_popularity_(rec_items, item_counts).mean(axis=0)
            for k in topk:
                out[f"{m}@{k}"] = float(per_pos[k - 1])
        elif m == "tailpercentage":
            per_pos = tail_percentage_(rec_items, item_counts, tail_ratio).mean(axis=0)
            for k in topk:
                out[f"{m}@{k}"] = float(per_pos[k - 1])
    return out


def compute_topk_metrics(
    pos_index: np.ndarray, pos_len: np.ndarray, metrics: List[str], topk: List[int]
) -> Dict[str, float]:
    """Average each metric@k over users; keys like ``recall@10``."""
    out = {}
    for metric in metrics:
        fn = METRIC_FNS[metric.lower()]
        per_user = fn(pos_index, pos_len)
        avg = per_user.mean(axis=0)
        for k in topk:
            out[f"{metric.lower()}@{k}"] = round(float(avg[k - 1]), 10)
    return out


def accumulate_topk_metrics(
    pos_index: np.ndarray, pos_len: np.ndarray, metrics: List[str], topk: List[int]
) -> Dict[str, np.ndarray]:
    """Per-user metric columns summed (for streaming accumulation)."""
    out = {}
    for metric in metrics:
        fn = METRIC_FNS[metric.lower()]
        per_user = fn(pos_index, pos_len)
        out[metric.lower()] = per_user.sum(axis=0)
    return out
