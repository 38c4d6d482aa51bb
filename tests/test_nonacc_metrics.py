"""Non-accuracy ranking metrics (ItemCoverage, AveragePopularity, GiniIndex,
ShannonEntropy, TailPercentage) — recbole 1.0.1 formula fidelity + e2e."""

import numpy as np

from recbole_cdr_tpu.evaluator.metrics import (
    average_popularity_,
    compute_non_accuracy_metrics,
    gini_index_,
    item_coverage_,
    shannon_entropy_,
    tail_percentage_,
)
from recbole_cdr_tpu.quick_start import objective_function


def test_item_coverage_hand_computed():
    rec = np.array([[1, 2], [2, 3]])
    # unique {1,2,3} over a 5-item space (PAD included in the denominator)
    np.testing.assert_allclose(item_coverage_(rec, 5), 3 / 5)


def test_gini_index_hand_computed():
    rec = np.array([[1, 1], [1, 2]])
    # counts {1:3, 2:1}; never-recommended items rank first with count 0
    # idx = [3,4]; ((2*3-5)*1 + (2*4-5)*3) / 4 / 4 = (1 + 9)/16
    np.testing.assert_allclose(gini_index_(rec, 4), 10 / 16)


def test_gini_index_uniform_is_low():
    # perfectly uniform recommendations over the whole space -> gini ~ 0
    rec = np.arange(1, 9).reshape(4, 2)
    num_items = 9  # ids 0..8, all but PAD recommended exactly once
    v = gini_index_(rec, num_items)
    assert v < 0.2


def test_shannon_entropy_hand_computed():
    rec = np.array([[1, 1], [1, 2]])
    p1, p2 = 3 / 4, 1 / 4
    expected = -(p1 * np.log(p1) + p2 * np.log(p2)) / 2
    np.testing.assert_allclose(shannon_entropy_(rec), expected)


def test_average_popularity_hand_computed():
    rec = np.array([[1, 2], [3, 1]])
    counts = np.array([0, 10, 20, 30])
    per_pos = average_popularity_(rec, counts).mean(axis=0)
    np.testing.assert_allclose(per_pos[0], (10 + 30) / 2)
    np.testing.assert_allclose(per_pos[1], (15 + 20) / 2)


def test_tail_percentage_hand_computed():
    counts = np.array([0, 5, 1, 10, 0])
    # tail cut over items SEEN in train: 3 items * 0.34 -> 1 item -> {2}
    rec = np.array([[2, 1], [3, 2]])
    per_pos = tail_percentage_(rec, counts, 0.34).mean(axis=0)
    np.testing.assert_allclose(per_pos[0], 0.5)  # [1, 0] at rank 1
    np.testing.assert_allclose(per_pos[1], 0.5)  # [[1,.5],[0,.5]]


def test_tail_percentage_absolute_threshold():
    counts = np.array([0, 5, 1, 10])
    # tail_ratio > 1: items with train count <= 5 -> {1, 2}
    rec = np.array([[1, 3]])
    per_pos = tail_percentage_(rec, counts, 5.0).mean(axis=0)
    np.testing.assert_allclose(per_pos, [1.0, 0.5])


def test_compute_non_accuracy_metrics_keys():
    rec = np.array([[1, 2, 3], [2, 3, 4]])
    counts = np.array([0, 4, 3, 2, 1])
    out = compute_non_accuracy_metrics(
        rec, counts, 5,
        ["itemcoverage", "averagepopularity", "giniindex",
         "shannonentropy", "tailpercentage"],
        [1, 3], 0.5,
    )
    assert set(out) == {
        f"{m}@{k}"
        for m in ("itemcoverage", "averagepopularity", "giniindex",
                  "shannonentropy", "tailpercentage")
        for k in (1, 3)
    }
    assert out["itemcoverage@3"] >= out["itemcoverage@1"]


def test_non_accuracy_metrics_e2e():
    r = objective_function(
        config_dict={
            "model": "CMF",
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 512,
            "eval_batch_size": 4096,
            "train_epochs": ["BOTH:2"],
            "stopping_step": 5,
            "metrics": ["Recall", "ItemCoverage", "AveragePopularity",
                        "GiniIndex", "ShannonEntropy", "TailPercentage"],
            "valid_metric": "Recall@10",
        },
        saved=False,
    )
    res = r["test_result"]
    for m in ("recall", "itemcoverage", "averagepopularity", "giniindex",
              "shannonentropy", "tailpercentage"):
        assert f"{m}@10" in res, res
    assert 0.0 < res["itemcoverage@10"] <= 1.0
    assert 0.0 <= res["giniindex@10"] <= 1.0
    assert 0.0 <= res["tailpercentage@10"] <= 1.0
    assert res["averagepopularity@10"] > 0.0
    assert res["shannonentropy@10"] > 0.0
