"""Learning-quality check: the bundled pair is generated from a latent-factor
process (tools/gen_example_data.py), so a trained CMF must rank far above
random (random recall@10 on ~180 items is ~0.056)."""

from recbole_cdr_tpu.quick_start import objective_function


def test_cmf_learns_above_random():
    r = objective_function(
        config_dict={
            "model": "CMF",
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 512,
            "eval_batch_size": 4096,
            "train_epochs": ["BOTH:15"],
            "stopping_step": 15,
            "learning_rate": 0.01,
        },
        saved=False,
    )
    assert r["test_result"]["recall@10"] > 0.15, r["test_result"]
    assert r["test_result"]["ndcg@10"] > 0.08, r["test_result"]
