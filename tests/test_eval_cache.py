"""Regression tests for host-side eval caches and host sampling hooks.

- BiTGCF's propagated-embedding cache must key on the trainer-bumped
  ``params_version`` counter, not ``id(params)`` (CPython recycles object
  ids after GC, which could silently serve a stale cache for a DIFFERENT
  params pytree).
- SSCDR's OVERLAP augment is vectorized; assert its semantics match the
  reference's per-row sampler (pos from interacted, neg never interacted,
  empty-history rows reject only 0).
"""

import jax
import jax.numpy as jnp
import numpy as np

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.utils import get_model, init_seed

_QUICK = {"state": "ERROR", "show_progress": False}


def _build(model_name, extra=None):
    config = CDRConfig(
        model=model_name, config_dict={**_QUICK, **(extra or {})}, _cli_args=[]
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    model = get_model(model_name)(config, dataset)
    return config, dataset, model


def test_bitgcf_eval_cache_cannot_alias_different_params():
    _, _, model = _build("BiTGCF")
    model.set_phase("BOTH")
    params_a = model.init_params(jax.random.PRNGKey(0))
    fs = model.full_sort_fn("BOTH")
    users = jnp.arange(1, 5)

    scores_a = np.asarray(fs(params_a, users))
    # same version twice -> cache hit (returns the SAME arrays, no recompute)
    cached = model._restore
    np.testing.assert_array_equal(np.asarray(fs(params_a, users)), scores_a)
    assert model._restore is cached

    # new pytree + trainer bump -> cache MUST refresh
    params_b = jax.tree_util.tree_map(lambda x: x * 2.0, params_a)
    model.notify_params_updated()
    scores_b = np.asarray(fs(params_b, users))
    assert model._restore is not cached
    assert not np.allclose(scores_a, scores_b)

    # fresh model at params_b agrees -> the refreshed cache is CORRECT
    _, _, model2 = _build("BiTGCF")
    model2.set_phase("BOTH")
    scores_b2 = np.asarray(model2.full_sort_fn("BOTH")(params_b, users))
    np.testing.assert_allclose(scores_b, scores_b2, rtol=1e-5, atol=1e-6)


def test_trainer_params_setter_bumps_model_version():
    from recbole_cdr_tpu.trainer.trainer import CrossDomainTrainer

    config, _, model = _build("BiTGCF")
    trainer = CrossDomainTrainer(config, model)
    v0 = model.params_version
    trainer.params = trainer.params  # any install invalidates
    assert model.params_version == v0 + 1


def test_sscdr_augment_semantics():
    _, dataset, model = _build("SSCDR")
    src = dataset.source_domain_dataset
    uids = src.arrays[src.uid_field]
    iids = src.arrays[src.iid_field]
    # the bundled pair overlaps on ITEMS: keys are item ids, vals are users
    keys, vals = (uids, iids) if model.mode == "overlap_users" else (iids, uids)
    interacted = {}
    for k, v in zip(keys, vals):
        interacted.setdefault(int(k), set()).add(int(v))

    n_over = (
        model.overlapped_num_users
        if model.mode == "overlap_users"
        else model.overlapped_num_items
    )
    ids = np.arange(n_over)
    batch = model.augment_batch({"overlap": ids}, "OVERLAP")
    pos, neg = batch["overlap_pos"], batch["overlap_neg"]
    cand = set(model._candidates.tolist())
    for k, i in enumerate(ids):
        inter = interacted.get(int(i), set())
        if inter:
            assert int(pos[k]) in inter, (i, pos[k])
            assert int(neg[k]) not in inter, (i, neg[k])
        else:
            assert int(pos[k]) == 0
            assert int(neg[k]) != 0  # reference substitutes [0] when empty
        assert int(neg[k]) in cand


def test_sscdr_augment_neg_uniform_over_complement():
    """The batched-rejection negative draw stays uniform over
    candidates \\ interacted (the reference's unbounded-retry law)."""
    _, dataset, model = _build("SSCDR")
    # pick an overlapped entity with a non-trivial interacted set
    n_over = (
        model.overlapped_num_users
        if model.mode == "overlap_users"
        else model.overlapped_num_items
    )
    cnt_per_key = model._ptr[1:] - model._ptr[:-1]
    u = int(np.argmax(cnt_per_key[1:n_over])) + 1
    inter = set(
        model._inter_vals_sorted[model._ptr[u] : model._ptr[u + 1]].tolist()
    )
    complement = np.setdiff1d(model._candidates, np.fromiter(inter, dtype=np.int64))
    draws = []
    ids = np.full(500, u)
    for _ in range(8):
        draws.extend(model.augment_batch({"overlap": ids}, "OVERLAP")["overlap_neg"])
    counts = np.bincount(np.asarray(draws), minlength=int(model._candidates.max()) + 1)
    assert counts[sorted(inter)].sum() == 0
    expected = len(draws) / len(complement)
    hit = counts[complement]
    # loose uniformity at n=4000 over the complement
    assert hit.max() < expected * 3 + 10
    assert (hit > 0).mean() > 0.6 or expected < 1.5
