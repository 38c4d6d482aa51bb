"""Metric correctness vs hand-computed values (recbole 1.0.1 definitions)."""

import numpy as np

from recbole_cdr_tpu.evaluator.metrics import (
    compute_topk_metrics,
    hit_,
    mrr_,
    ndcg_,
    precision_,
    recall_,
)

# user A: hits at ranks 1 and 3, 2 positives total
# user B: hit at rank 2, 3 positives total
# user C: no hits, 1 positive
POS_INDEX = np.array(
    [
        [1, 0, 1, 0, 0],
        [0, 1, 0, 0, 0],
        [0, 0, 0, 0, 0],
    ],
    dtype=bool,
)
POS_LEN = np.array([2, 3, 1])


def test_hit():
    h = hit_(POS_INDEX, POS_LEN)
    assert h[:, 4].tolist() == [1, 1, 0]
    assert h[:, 0].tolist() == [1, 0, 0]


def test_mrr():
    m = mrr_(POS_INDEX, POS_LEN)
    np.testing.assert_allclose(m[:, 4], [1.0, 0.5, 0.0])
    np.testing.assert_allclose(m[:, 0], [1.0, 0.0, 0.0])


def test_recall():
    r = recall_(POS_INDEX, POS_LEN)
    np.testing.assert_allclose(r[:, 4], [2 / 2, 1 / 3, 0.0])
    np.testing.assert_allclose(r[:, 2], [2 / 2, 1 / 3, 0.0])
    np.testing.assert_allclose(r[:, 0], [1 / 2, 0.0, 0.0])


def test_precision():
    p = precision_(POS_INDEX, POS_LEN)
    np.testing.assert_allclose(p[:, 4], [2 / 5, 1 / 5, 0.0])
    np.testing.assert_allclose(p[:, 0], [1.0, 0.0, 0.0])


def test_ndcg():
    n = ndcg_(POS_INDEX, POS_LEN)
    # user A @5: dcg = 1/log2(2) + 1/log2(4); idcg over min(2,5)=2 ranks
    dcg_a = 1.0 + 1.0 / np.log2(4)
    idcg_a = 1.0 + 1.0 / np.log2(3)
    np.testing.assert_allclose(n[0, 4], dcg_a / idcg_a)
    # user B @5: dcg = 1/log2(3); idcg over min(3,5)=3
    idcg_b = 1.0 + 1.0 / np.log2(3) + 1.0 / np.log2(4)
    np.testing.assert_allclose(n[1, 4], (1.0 / np.log2(3)) / idcg_b)
    np.testing.assert_allclose(n[2, 4], 0.0)


def test_compute_topk_metrics_averaging():
    out = compute_topk_metrics(POS_INDEX, POS_LEN, ["Recall", "Hit"], [5])
    np.testing.assert_allclose(out["recall@5"], (1.0 + 1 / 3 + 0.0) / 3)
    np.testing.assert_allclose(out["hit@5"], 2 / 3)
