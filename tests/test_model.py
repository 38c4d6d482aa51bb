"""End-to-end 1-epoch smoke tests per model on the bundled example pair —
the reference's test strategy (`tests/test_model.py:1-89`), plus metric-shape
asserts the reference lacks."""

import pytest

from recbole_cdr_tpu.quick_start import objective_function

quick_config = {
    "state": "ERROR",
    "show_progress": False,
    "train_batch_size": 512,
    "eval_batch_size": 2048,
}


def run_model(model, extra=None):
    config_dict = {"model": model, **quick_config, **(extra or {})}
    result = objective_function(config_dict=config_dict, saved=False)
    assert "test_result" in result
    for key in ("recall@10", "mrr@10", "ndcg@10", "hit@10", "precision@10"):
        assert key in result["test_result"]
        assert 0.0 <= result["test_result"][key] <= 1.0
    return result


def test_cmf():
    run_model("CMF", {"train_epochs": ["BOTH:1"]})


def test_clfm():
    run_model("CLFM", {"train_epochs": ["BOTH:1"]})


def test_conet():
    run_model("CoNet", {"train_epochs": ["BOTH:1"]})


def test_dtcdr_neumf():
    run_model("DTCDR", {"train_epochs": ["BOTH:1"], "base_model": "NeuMF"})


def test_dtcdr_dmf():
    run_model("DTCDR", {"train_epochs": ["BOTH:1"], "base_model": "DMF"})


def test_deepapf():
    run_model("DeepAPF", {"train_epochs": ["BOTH:1"]})


def test_bitgcf():
    run_model("BiTGCF", {"train_epochs": ["BOTH:1"]})


def test_emcdr():
    run_model("EMCDR", {"train_epochs": ["SOURCE:1", "TARGET:1", "OVERLAP:1"]})


def test_sscdr():
    run_model("SSCDR", {"train_epochs": ["SOURCE:1", "TARGET:1", "OVERLAP:1"]})


def test_dcdcsr():
    run_model("DCDCSR", {"train_epochs": ["SOURCE:1", "TARGET:1", "BOTH:1", "TARGET:1"]})


def test_natr():
    run_model("NATR", {"train_epochs": ["SOURCE:1", "TARGET:1"]})
