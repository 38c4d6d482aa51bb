"""Streaming full-sort evaluation equals the dense evaluator bit-for-bit,
for every model exposing the dot-product factor form (full_sort_factors)."""

import numpy as np
import pytest

from recbole_cdr_tpu.quick_start import objective_function

SCHEDULES = {
    "CMF": ["BOTH:2"],
    "CLFM": ["BOTH:1"],
    "BiTGCF": ["BOTH:1"],
    "EMCDR": ["SOURCE:1", "TARGET:1", "OVERLAP:1"],
    "DCDCSR": ["SOURCE:1", "TARGET:1", "BOTH:1", "TARGET:1"],
}


@pytest.mark.parametrize("model", list(SCHEDULES))
def test_streaming_eval_matches_dense(model):
    base = {
        "model": model,
        "state": "ERROR",
        "show_progress": False,
        "train_batch_size": 512,
        "eval_batch_size": 2048,
        "train_epochs": SCHEDULES[model],
        "seed": 2022,
    }
    dense = objective_function(config_dict={**base, "streaming_topk_threshold": 10**9},
                               saved=False)
    streaming = objective_function(config_dict={**base, "streaming_topk_threshold": 0},
                                   saved=False)
    for k, v in dense["test_result"].items():
        assert abs(streaming["test_result"][k] - v) < 1e-9, (
            k, streaming["test_result"][k], v
        )
