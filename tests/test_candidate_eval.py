"""Candidate-ranking (uniform-N) evaluation path end-to-end."""

from recbole_cdr_tpu.quick_start import objective_function


def test_cmf_uniform_eval_mode():
    r = objective_function(
        config_dict={
            "model": "CMF",
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 512,
            "eval_batch_size": 2048,
            "train_epochs": ["BOTH:1"],
            "eval_args": {
                "split": {"RS": [0.8, 0.1, 0.1]},
                "group_by": "user",
                "order": "RO",
                "mode": "uniform 20",
            },
        },
        saved=False,
    )
    res = r["test_result"]
    for key in ("recall@10", "mrr@10", "ndcg@10", "hit@10", "precision@10"):
        assert key in res
        assert 0.0 <= res[key] <= 1.0
    # ranking among ~20x fewer candidates than full-sort: hit@10 should be
    # clearly above the full-sort smoke level even after 1 epoch
    assert res["hit@10"] > 0.05
