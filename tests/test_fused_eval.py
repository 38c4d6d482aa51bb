"""The fused device eval pass (one jitted scan over user tiles,
`evaluator/evaluator.py::FullSortEvaluator._evaluate_fused`) must produce
EXACTLY the same metrics as the per-batch loop it replaces — including GAUC
rank sums, non-accuracy metrics, and a user count that does not divide the
tile size."""

import jax
import jax.numpy as jnp
import numpy as np

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.data.utils import data_preparation
from recbole_cdr_tpu.evaluator.evaluator import FullSortEvaluator
from recbole_cdr_tpu.utils import get_model, init_seed

_QUICK = {"state": "ERROR", "show_progress": False}


def _setup(extra=None):
    config = CDRConfig(
        model="CMF",
        config_dict={**_QUICK, "eval_batch_size": 4096, **(extra or {})},
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    _, _, test_data = data_preparation(config, dataset)
    model = get_model("CMF")(config, dataset)
    params = model.init_params(jax.random.PRNGKey(3))
    score_fn = jax.jit(model.full_sort_fn("BOTH"))
    return config, test_data, params, score_fn


def _loop_variant(score_fn):
    """Same scorer forced onto the per-batch loop path."""

    def loop_fn(params, users):
        return score_fn(params, users)

    loop_fn._no_jit = True
    return loop_fn


def test_fused_matches_loop_topk_metrics():
    config, test_data, params, score_fn = _setup()
    ev = FullSortEvaluator(config)
    # users must not divide the tile size for this to cover the padded tail
    assert len(test_data.uid_list) % test_data.user_batch != 0, (
        "fixture no longer exercises the padded tail — change eval_batch_size")
    fused = ev.evaluate(score_fn, params, test_data)
    loop = FullSortEvaluator(config).evaluate(
        _loop_variant(score_fn), params, test_data
    )
    assert fused == loop
    assert fused["recall@10"] > 0  # not comparing two empty dicts


def test_fused_matches_loop_gauc_and_nonacc():
    config, test_data, params, score_fn = _setup(
        {"metrics": ["Recall", "NDCG", "GAUC", "ItemCoverage", "GiniIndex"]}
    )
    ev = FullSortEvaluator(config)
    fused = ev.evaluate(score_fn, params, test_data)
    loop = FullSortEvaluator(config).evaluate(
        _loop_variant(score_fn), params, test_data
    )
    assert fused == loop
    assert fused["gauc"] > 0


def test_fused_segmented_matches_single_dispatch():
    """A tiny per-dispatch element budget forces multiple segments (+ a
    remainder program with a different static seg_tiles) — results must be
    identical to the unsegmented pass and the loop path."""
    config, test_data, params, score_fn = _setup()
    ev = FullSortEvaluator(config)
    whole = ev.evaluate(score_fn, params, test_data)

    ev_seg = FullSortEvaluator(config)
    ev_seg.DENSE_SEG_ELEMS = 2 * test_data.user_batch * test_data.item_num
    n_tiles = -(-len(test_data.uid_list) // test_data.user_batch)
    assert n_tiles > 3  # budget of 2 tiles/dispatch -> >=2 segments
    segged = ev_seg.evaluate(score_fn, params, test_data)
    assert segged == whole
    assert len(ev_seg._fused_fns) >= 1


def test_fused_program_cache_reused():
    config, test_data, params, score_fn = _setup()
    ev = FullSortEvaluator(config)
    ev.evaluate(score_fn, params, test_data)
    assert len(ev._fused_fns) == 1
    ev.evaluate(score_fn, params, test_data)
    assert len(ev._fused_fns) == 1  # same (fn, shape) key -> no re-trace
