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


def test_streaming_bf16_scoring_close_to_f32():
    """eval_score_dtype: bfloat16 — factors cast to bf16, accumulation/top-k
    f32 (ops/topk._score_dot). Metrics may differ from f32 scoring only where
    bf16 rounding flips a near-tie, so assert closeness, not equality."""
    base = {
        "model": "CMF",
        "state": "ERROR",
        "show_progress": False,
        "train_batch_size": 512,
        "eval_batch_size": 2048,
        "train_epochs": ["BOTH:2"],
        "seed": 2022,
        "streaming_topk_threshold": 0,
    }
    f32 = objective_function(config_dict=base, saved=False)
    bf16 = objective_function(
        config_dict={**base, "eval_score_dtype": "bfloat16"}, saved=False
    )
    for k, v in f32["test_result"].items():
        assert abs(bf16["test_result"][k] - v) < 0.02, (
            k, bf16["test_result"][k], v
        )
