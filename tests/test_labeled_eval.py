"""Leave-one-out (LS) split + labeled value-metric eval + GAUC, end-to-end.

Covers the recbole 1.0.1 surfaces: `eval_args split: {LS: valid_and_test}`,
`eval_args mode: labeled` with EvaluatorType.VALUE metrics (AUC/MAE/RMSE/
LogLoss), and the GAUC ranking metric computed from full-row rank statistics
(reference: recbole metrics imported at recbole_cdr/config/configurator.py:13).
"""

import numpy as np

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.quick_start import objective_function
from recbole_cdr_tpu.utils import init_seed


BASE = {
    "model": "CMF",
    "state": "ERROR",
    "show_progress": False,
    "train_batch_size": 512,
    "eval_batch_size": 4096,
    "train_epochs": ["BOTH:2"],
    "stopping_step": 5,
}


def test_leave_one_out_split_counts():
    config = CDRConfig(
        model="CMF",
        config_dict={
            **BASE,
            "eval_args": {
                "split": {"LS": "valid_and_test"},
                "group_by": "user",
                "order": "RO",
                "mode": "full",
            },
        },
        _cli_args=[],
    )
    init_seed(42, True)
    ds = CrossDomainDataset(config)
    splits = ds.build()
    tgt_train, tgt_valid, tgt_test = splits[-3], splits[-2], splits[-1]
    uid = "target_user_id"
    n_total = len(tgt_train[uid]) + len(tgt_valid[uid]) + len(tgt_test[uid])
    assert n_total == len(ds.target_domain_dataset.arrays[uid])
    # every user with >2 interactions contributes exactly 1 valid + 1 test row
    all_uid = np.concatenate([tgt_train[uid], tgt_valid[uid], tgt_test[uid]])
    counts = dict(zip(*np.unique(all_uid, return_counts=True)))
    v_counts = dict(zip(*np.unique(tgt_valid[uid], return_counts=True)))
    t_counts = dict(zip(*np.unique(tgt_test[uid], return_counts=True)))
    for u, c in counts.items():
        if c > 2:
            assert v_counts.get(u) == 1 and t_counts.get(u) == 1
        else:  # tiny users keep everything in train
            assert u not in v_counts and u not in t_counts


def test_leave_one_out_preserves_order():
    """With TO ordering, the held-out rows are each user's LAST interactions."""
    config = CDRConfig(
        model="CMF",
        config_dict={
            **BASE,
            "source_load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
            "target_load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
            "eval_args": {
                "split": {"LS": "test_only"},
                "group_by": "user",
                "order": "TO",
                "mode": "full",
            },
        },
        _cli_args=[],
    )
    init_seed(42, True)
    ds = CrossDomainDataset(config)
    splits = ds.build()
    tgt_train, tgt_valid, tgt_test = splits[-3], splits[-2], splits[-1]
    assert len(tgt_valid["target_user_id"]) == 0
    ts = "target_timestamp"
    tr_u, tr_t = tgt_train["target_user_id"], tgt_train[ts]
    te_u, te_t = tgt_test["target_user_id"], tgt_test[ts]
    assert len(te_u) == len(np.unique(te_u))  # one test row per user
    for u in np.unique(te_u):
        assert tr_t[tr_u == u].max() <= te_t[te_u == u].min()


def test_labeled_value_metric_eval_e2e():
    r = objective_function(
        config_dict={
            **BASE,
            "threshold": {"rating": 4},
            # default val_interval would drop the rating column pre-threshold
            "source_val_interval": None,
            "target_val_interval": None,
            "metrics": ["AUC", "MAE", "RMSE", "LogLoss"],
            "valid_metric": "AUC",
            "eval_args": {
                "split": {"RS": [0.8, 0.1, 0.1]},
                "group_by": "user",
                "order": "RO",
                "mode": "labeled",
            },
        },
        saved=False,
    )
    res = r["test_result"]
    assert set(res) == {"auc", "mae", "rmse", "logloss"}
    assert 0.0 <= res["auc"] <= 1.0
    assert res["rmse"] >= res["mae"] >= 0.0
    assert np.isfinite(res["logloss"]) and res["logloss"] > 0.0


def test_gauc_full_sort_e2e():
    r = objective_function(
        config_dict={
            **BASE,
            "metrics": ["Recall", "GAUC", "NDCG"],
            "valid_metric": "GAUC",
        },
        saved=False,
    )
    res = r["test_result"]
    assert "gauc" in res and "recall@10" in res and "ndcg@10" in res
    assert 0.0 < res["gauc"] <= 1.0


def test_gauc_beats_random_after_training():
    r = objective_function(
        config_dict={
            **BASE,
            "train_epochs": ["BOTH:10"],
            "learning_rate": 0.01,
            "metrics": ["GAUC"],
            "valid_metric": "GAUC",
        },
        saved=False,
    )
    # a trained model must order positives far above the 0.5 random baseline
    assert r["test_result"]["gauc"] > 0.7, r["test_result"]
