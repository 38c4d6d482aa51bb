"""Streaming full-sort evaluation equals the dense evaluator bit-for-bit."""

import numpy as np

from recbole_cdr_tpu.quick_start import objective_function


def test_streaming_eval_matches_dense():
    base = {
        "model": "CMF",
        "state": "ERROR",
        "show_progress": False,
        "train_batch_size": 512,
        "eval_batch_size": 2048,
        "train_epochs": ["BOTH:2"],
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
