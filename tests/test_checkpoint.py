"""Checkpoint save / load_data_and_model restore round trip."""

import glob
import os

import numpy as np

from recbole_cdr_tpu.quick_start import load_data_and_model, objective_function


def test_checkpoint_roundtrip(tmp_path):
    ckpt_dir = str(tmp_path / "saved")
    r = objective_function(
        config_dict={
            "model": "CMF",
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 512,
            "eval_batch_size": 2048,
            "train_epochs": ["BOTH:2"],
            "checkpoint_dir": ckpt_dir,
        },
        saved=True,
    )
    files = glob.glob(os.path.join(ckpt_dir, "CMF-*.pth"))
    assert files, "no checkpoint written"

    config, model, params, dataset, train_data, valid_data, test_data = load_data_and_model(
        files[0]
    )
    assert config["model"] == "CMF"
    assert "user_embedding" in params
    assert params["user_embedding"].shape[0] == dataset.num_total_user

    # restored params reproduce the recorded test metrics
    from recbole_cdr_tpu.evaluator import FullSortEvaluator
    import jax

    ev = FullSortEvaluator(config)
    score_fn = jax.jit(model.full_sort_fn("TARGET"))
    result = ev.evaluate(score_fn, params, test_data)
    for k, v in r["test_result"].items():
        assert abs(result[k] - v) < 1e-6, (k, result[k], v)
