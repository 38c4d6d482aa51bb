"""Ranking metrics, numerically identical to recbole 1.0.1's definitions.

All metrics consume:
- ``pos_index``: bool [n_users, max_k] — whether the i-th ranked item is a
  positive (ground-truth) item
- ``pos_len``: int [n_users] — number of ground-truth items per user

and return a [n_users, max_k] matrix whose column ``k-1`` is the metric@k.
"""

from typing import Dict, List

import numpy as np


def hit_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    result = np.cumsum(pos_index, axis=1)
    return (result > 0).astype(int)


def mrr_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    idxs = pos_index.argmax(axis=1)
    result = np.zeros_like(pos_index, dtype=np.float64)
    for row, idx in enumerate(idxs):
        if pos_index[row, idx] > 0:
            result[row, idx:] = 1.0 / (idx + 1)
        else:
            result[row, idx:] = 0.0
    return result


def recall_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    return np.cumsum(pos_index, axis=1) / pos_len.reshape(-1, 1)


def ndcg_(pos_index: np.ndarray, pos_len: np.ndarray) -> np.ndarray:
    len_rank = np.full_like(pos_len, pos_index.shape[1])
    idcg_len = np.where(pos_len > len_rank, len_rank, pos_len)

    iranks = np.zeros_like(pos_index, dtype=np.float64)
    iranks[:, :] = np.arange(1, pos_index.shape[1] + 1)
    idcg = np.cumsum(1.0 / np.log2(iranks + 1), axis=1)
    for row, idx in enumerate(idcg_len):
        idcg[row, idx:] = idcg[row, idx - 1]

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
    result = np.zeros_like(pos_index, dtype=np.float64)
    for row, lens in enumerate(actual_len):
        ranges = np.arange(1, pos_index.shape[1] + 1)
        ranges[lens:] = ranges[lens - 1]
        result[row] = sum_pre[row] / ranges
    return result


METRIC_FNS = {
    "hit": hit_,
    "mrr": mrr_,
    "recall": recall_,
    "ndcg": ndcg_,
    "precision": precision_,
    "map": map_,
}


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
