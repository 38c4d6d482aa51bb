"""Exhaustive hyper-parameter search smoke (reference `run_hyper.py:1-31`)."""

import os

from recbole_cdr_tpu.quick_start import objective_function
from recbole_cdr_tpu.trainer.hyper_tuning import HyperTuning


def test_exhaustive_search(tmp_path):
    params_file = tmp_path / "hyper.test"
    params_file.write_text("learning_rate choice [0.01,0.001]\n")

    base = {
        "model": "CMF",
        "state": "ERROR",
        "show_progress": False,
        "train_batch_size": 512,
        "eval_batch_size": 2048,
        "train_epochs": ["BOTH:1"],
    }

    def objective(config_dict=None, config_file_list=None, saved=True):
        merged = {**base, **(config_dict or {})}
        return objective_function(config_dict=merged, saved=False)

    hp = HyperTuning(objective, algo="exhaustive", params_file=str(params_file))
    hp.run()
    assert len(hp.params2result) == 2
    assert hp.best_params is not None
    assert "learning_rate" in hp.best_params

    out = tmp_path / "hyper.result"
    hp.export_result(str(out))
    assert out.exists() and out.read_text().count("\n") == 2
