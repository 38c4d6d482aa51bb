"""Mixed-precision (``compute_dtype: bfloat16``) and ``donate_params``
coverage: every model trains end-to-end at bf16, the flagship's ranking
quality matches f32 within tolerance, and master params stay f32."""

import jax.numpy as jnp
import numpy as np
import pytest

from recbole_cdr_tpu.quick_start import objective_function
from recbole_cdr_tpu.utils.precision import cast_floats, resolve_compute_dtype

_QUICK = {
    "state": "ERROR",
    "show_progress": False,
    "train_batch_size": 512,
    "eval_batch_size": 2048,
}

_SCHEDULES = {
    "CMF": ["BOTH:1"],
    "CLFM": ["BOTH:1"],
    "CoNet": ["BOTH:1"],
    "DTCDR": ["BOTH:1"],
    "DeepAPF": ["BOTH:1"],
    "BiTGCF": ["BOTH:1"],
    "EMCDR": ["SOURCE:1", "TARGET:1", "OVERLAP:1"],
    "SSCDR": ["SOURCE:1", "TARGET:1", "OVERLAP:1"],
    "DCDCSR": ["SOURCE:1", "TARGET:1", "BOTH:1", "TARGET:1"],
    "NATR": ["SOURCE:1", "TARGET:1"],
}


def test_cast_floats_types():
    tree = {
        "table": jnp.ones((4, 2), jnp.float32),
        "ids": jnp.arange(3, dtype=jnp.int32),
        "mask": jnp.ones(3, bool),
    }
    out = cast_floats(tree, jnp.bfloat16)
    assert out["table"].dtype == jnp.bfloat16
    assert out["ids"].dtype == jnp.int32
    assert out["mask"].dtype == bool


def test_resolve_compute_dtype_rejects_garbage():
    with pytest.raises(ValueError):
        resolve_compute_dtype({"compute_dtype": "int8"})


@pytest.mark.parametrize("model", sorted(_SCHEDULES))
def test_all_models_train_bf16(model):
    r = objective_function(
        config_dict={
            "model": model,
            **_QUICK,
            "train_epochs": _SCHEDULES[model],
            "compute_dtype": "bfloat16",
        },
        saved=False,
    )
    for key in ("recall@10", "mrr@10", "ndcg@10"):
        v = r["test_result"][key]
        assert 0.0 <= v <= 1.0 and np.isfinite(v), (model, key, v)


def test_bf16_quality_matches_f32():
    """Same seed, same RNG stream — the only divergence is rounding; the
    converged ranking metrics must agree within noise tolerance."""
    results = {}
    for dtype in ("float32", "bfloat16"):
        r = objective_function(
            config_dict={
                "model": "CMF",
                **_QUICK,
                "train_epochs": ["BOTH:3"],
                "compute_dtype": dtype,
            },
            saved=False,
        )
        results[dtype] = r["test_result"]
    for key in ("recall@10", "ndcg@10", "mrr@10"):
        assert abs(results["bfloat16"][key] - results["float32"][key]) < 0.04, results


def test_bf16_host_path_and_donate_off():
    """bf16 through the host batching path (steps_per_call scan) with buffer
    donation disabled."""
    r = objective_function(
        config_dict={
            "model": "CMF",
            **_QUICK,
            "train_epochs": ["BOTH:2"],
            "compute_dtype": "bfloat16",
            "device_side_sampling": False,
            "steps_per_call": 4,
            "donate_params": False,
        },
        saved=False,
    )
    assert 0.0 <= r["test_result"]["recall@10"] <= 1.0


def test_master_params_stay_f32():
    from recbole_cdr_tpu.config import CDRConfig
    from recbole_cdr_tpu.data.dataset import CrossDomainDataset
    from recbole_cdr_tpu.data.utils import data_preparation
    from recbole_cdr_tpu.trainer.trainer import CrossDomainTrainer
    from recbole_cdr_tpu.utils import get_model, init_seed

    config = CDRConfig(
        model="CMF",
        config_dict={**_QUICK, "train_epochs": ["BOTH:1"],
                     "compute_dtype": "bfloat16"},
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    train_data, valid_data, _ = data_preparation(config, dataset)
    model = get_model("CMF")(config, dataset)
    trainer = CrossDomainTrainer(config, model)
    trainer.fit(train_data, valid_data, verbose=False, saved=False)
    for k, v in trainer.params.items():
        assert v.dtype == jnp.float32, (k, v.dtype)
