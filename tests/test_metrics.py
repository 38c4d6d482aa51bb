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


# ------------------------------------------------------------- value metrics

from recbole_cdr_tpu.evaluator.metrics import (  # noqa: E402
    auc_,
    gauc_,
    logloss_,
    mae_,
    rmse_,
)


def test_auc_hand_computed_with_ties():
    trues = np.array([1.0, 0.0, 1.0, 0.0])
    preds = np.array([0.9, 0.8, 0.8, 0.1])
    # pairs: (0.9>0.8)=1, (0.9>0.1)=1, (0.8==0.8)=0.5, (0.8>0.1)=1 -> 3.5/4
    np.testing.assert_allclose(auc_(trues, preds), 0.875)


def test_auc_perfect_and_inverted():
    trues = np.array([1, 1, 0, 0])
    assert auc_(trues, np.array([0.9, 0.8, 0.2, 0.1])) == 1.0
    assert auc_(trues, np.array([0.1, 0.2, 0.8, 0.9])) == 0.0


def test_auc_degenerate_returns_zero():
    assert auc_(np.array([1.0, 1.0]), np.array([0.5, 0.6])) == 0.0
    assert auc_(np.array([0.0, 0.0]), np.array([0.5, 0.6])) == 0.0


def test_value_metrics_hand_computed():
    trues = np.array([1.0, 0.0, 1.0])
    preds = np.array([0.8, 0.4, 0.5])
    np.testing.assert_allclose(mae_(trues, preds), (0.2 + 0.4 + 0.5) / 3)
    np.testing.assert_allclose(
        rmse_(trues, preds), np.sqrt((0.04 + 0.16 + 0.25) / 3)
    )
    expected_ll = -(np.log(0.8) + np.log(0.6) + np.log(0.5)) / 3
    np.testing.assert_allclose(logloss_(trues, preds), expected_ll)


def test_logloss_clips_extreme_predictions():
    # preds at exactly 0/1 must not produce inf (recbole clips at 1e-15)
    v = logloss_(np.array([1.0, 0.0]), np.array([0.0, 1.0]))
    assert np.isfinite(v)


def test_gauc_hand_computed():
    # user A: 5 items, positives at descending ranks 1 and 3
    #   pairs won: 3 + 2 = 5 of 2*3 -> auc 5/6
    # user B: 4 items, single positive at rank 4 (worst) -> auc 0
    user_len = np.array([5, 4])
    pos_len = np.array([2, 1])
    rank_sum = np.array([1.0 + 3.0, 4.0])
    expected = (5 / 6 * 2 + 0.0 * 1) / 3
    np.testing.assert_allclose(gauc_(user_len, pos_len, rank_sum), expected)


def test_gauc_drops_degenerate_users():
    # a user with zero positives contributes nothing
    user_len = np.array([5, 5])
    pos_len = np.array([2, 0])
    rank_sum = np.array([4.0, 0.0])
    np.testing.assert_allclose(gauc_(user_len, pos_len, rank_sum), 5 / 6)
    # a user whose positives fill the row (zero negatives) is dropped too
    user_len = np.array([5, 3])
    pos_len = np.array([2, 3])
    rank_sum = np.array([4.0, 6.0])
    np.testing.assert_allclose(gauc_(user_len, pos_len, rank_sum), 5 / 6)
