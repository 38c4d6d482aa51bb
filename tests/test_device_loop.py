"""Unit coverage for the device-resident epoch loop's hot-path sampler
(threefry base + murmur3-finalizer remix, transposed compare layout) and the
BOTH-phase per-cycle source reshuffle.

The sampler rewrite previously had no direct tests (ADVICE r1): these assert
(a) negatives never hit user history for non-degenerate users, (b) roughly
uniform draws for an empty-history user, (c) the H-not-multiple-of-32
padding path, (d) each BOTH-phase source cycle walks a FRESH permutation
(host-path / reference reshuffle-on-exhaustion parity).
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recbole_cdr_tpu.data.batching import OverlapBatcher, TrainBatcher
from recbole_cdr_tpu.data.dataset import InteractionTable, OverlapTable
from recbole_cdr_tpu.sampler import DomainNegSampler
from recbole_cdr_tpu.trainer.device_loop import (
    _HIST_CHUNK,
    DeviceEpochLoop,
    _sample_negatives,
    _shuffle_keys,
    _swap_or_not,
)
from recbole_cdr_tpu.utils.enums import InputType, TrainMode


def _hist(rows, num_users, num_items):
    """Padded history matrix [num_users, H] with sentinel num_items."""
    H = max((len(r) for r in rows), default=1) or 1
    out = np.full((num_users, H), num_items, dtype=np.int32)
    for u, r in enumerate(rows):
        out[u, : len(r)] = r
    return jnp.asarray(out)


def test_sample_negatives_avoids_history():
    num_items = 101  # candidates 1..100
    candidates = jnp.arange(1, num_items, dtype=jnp.int32)
    rng_np = np.random.default_rng(0)
    # 16 users, each with ~25% of the candidate set as history:
    # false-negative probability per slot is (1/4)^16 ~= 2e-10
    rows = [rng_np.choice(np.arange(1, num_items), 25, replace=False) for _ in range(16)]
    hist = _hist(rows, 16, num_items)
    uids = jnp.asarray(np.tile(np.arange(16), 64), jnp.int32)  # 1024 slots
    neg = np.asarray(
        _sample_negatives(jax.random.PRNGKey(1), uids, hist, candidates, neg_num=2)
    )
    uid_rep = np.tile(np.asarray(uids), 2)
    for k in range(len(neg)):
        assert neg[k] not in rows[uid_rep[k]], (k, neg[k])
        assert 1 <= neg[k] < num_items


def test_sample_negatives_uniform_for_empty_history():
    num_items = 21  # candidates 1..20
    candidates = jnp.arange(1, num_items, dtype=jnp.int32)
    hist = _hist([[]], 1, num_items)  # one user, empty history
    uids = jnp.zeros(8000, jnp.int32)
    neg = np.asarray(
        _sample_negatives(jax.random.PRNGKey(7), uids, hist, candidates, neg_num=1)
    )
    counts = np.bincount(neg, minlength=num_items)
    assert counts[0] == 0  # PAD never drawn
    expected = len(neg) / 20
    # loose uniformity: every candidate within 25% of expected at n=8000
    assert counts[1:].min() > expected * 0.75, counts
    assert counts[1:].max() < expected * 1.25, counts


def test_sample_negatives_ragged_history_padding():
    # H = 5 is not a multiple of _HIST_CHUNK=32 -> exercises the pad path
    assert 5 % _HIST_CHUNK != 0
    num_items = 11
    candidates = jnp.arange(1, num_items, dtype=jnp.int32)
    rows = [[1, 2, 3, 4, 5], [6, 7], []]
    hist = _hist(rows, 3, num_items)
    assert hist.shape[1] == 5
    uids = jnp.asarray(np.tile(np.arange(3), 200), jnp.int32)
    neg = np.asarray(
        _sample_negatives(jax.random.PRNGKey(3), uids, hist, candidates, neg_num=1)
    )
    for k in range(len(neg)):
        assert neg[k] not in rows[int(uids[k])]
        assert 1 <= neg[k] < num_items


# ------------------------------------------------- swap-or-not epoch shuffle


def test_swap_or_not_is_a_permutation_for_any_n():
    for seed, n in [(0, 1), (1, 2), (2, 7), (3, 97), (4, 1000), (5, 12345)]:
        keys, salts = _shuffle_keys(jax.random.PRNGKey(seed), n)
        out = np.asarray(_swap_or_not(jnp.arange(n, dtype=jnp.int32), n, keys, salts))
        assert sorted(out.tolist()) == list(range(n)), (seed, n)


def test_swap_or_not_positionwise_uniform():
    """Across many keys, the slot -> value frequency table must be
    chi-square-consistent with uniform (measured chi2 ~ df; a biased
    shuffle blows past 2x df immediately)."""
    n, trials = 16, 2000
    x = jnp.arange(n, dtype=jnp.int32)
    f = jax.jit(jax.vmap(lambda k, s: _swap_or_not(x, n, k, s)))
    keys, salts = jax.vmap(
        lambda t: _shuffle_keys(jax.random.PRNGKey(t), n)
    )(jnp.arange(trials))
    outs = np.asarray(f(keys, salts))
    counts = np.zeros((n, n), np.int64)
    for out in outs:
        counts[np.arange(n), out] += 1
    expected = trials / n
    chi2 = ((counts - expected) ** 2 / expected).sum()
    df = n * (n - 1)
    assert chi2 < 2 * df, (chi2, df)


def test_swap_or_not_per_cycle_broadcast_matches_scalar():
    """The [n_cycles, ROUNDS] broadcast form used for BOTH-phase source
    cycles must equal applying each cycle's keys independently."""
    n, n_cycles, width = 37, 3, 8
    keys, salts = _shuffle_keys(jax.random.PRNGKey(9), n, (n_cycles,))
    slots = jnp.tile(jnp.arange(width, dtype=jnp.int32)[None, :], (n_cycles, 1))
    batched = np.asarray(
        _swap_or_not(slots, n, keys[:, None, :], salts[:, None, :])
    )
    for c in range(n_cycles):
        single = np.asarray(
            _swap_or_not(slots[c], n, keys[c], salts[c])
        )
        np.testing.assert_array_equal(batched[c], single)


# --------------------------------------------------------------- reshuffle


def _make_loop_data(src_n, tgt_n, batch):
    """Source with unique item ids (row identity), target larger so the
    source cycles multiple times per epoch."""

    def table(prefix, n):
        return InteractionTable(
            {
                f"{prefix}_user_id": np.ones(n, dtype=np.int64),
                f"{prefix}_item_id": np.arange(1, n + 1, dtype=np.int64),
            },
            uid_field=f"{prefix}_user_id",
            iid_field=f"{prefix}_item_id",
            label_field=f"{prefix}_label",
            neg_prefix="neg_",
        )

    src_t, tgt_t = table("source", src_n), table("target", tgt_n)
    num_items = max(src_n, tgt_n) + 2
    src_s = DomainNegSampler(["train"], [src_t], num_items=num_items).set_phase("train")
    tgt_s = DomainNegSampler(["train"], [tgt_t], num_items=num_items).set_phase("train")
    src_b = TrainBatcher(src_t, src_s, InputType.PAIRWISE, 1, batch)
    tgt_b = TrainBatcher(tgt_t, tgt_s, InputType.PAIRWISE, 1, batch)
    return SimpleNamespace(
        source_batcher=src_b,
        target_batcher=tgt_b,
        overlap_batcher=OverlapBatcher(OverlapTable(4), 4),
    )


def test_both_phase_source_reshuffles_each_cycle():
    src_n, tgt_n, batch = 8, 32, 4
    train_data = _make_loop_data(src_n, tgt_n, batch)
    seen = []

    def collect(iids, weights):
        seen.append(np.asarray(iids)[np.asarray(weights) > 0].tolist())

    def loss_fn(params, b, rng=None):
        jax.debug.callback(collect, b["source_item_id"], b["source_sample_weight"],
                           ordered=True)
        return 0.0 * jnp.sum(params["w"])

    loop = DeviceEpochLoop(
        TrainMode.BOTH, loss_fn, optax.sgd(0.0), train_data,
        InputType.PAIRWISE, neg_num=1, num_users=3,
        base_rng=jax.random.PRNGKey(5),
    )
    assert loop.src_batches_per_cycle == 2 and loop.src_cycles == 4
    params = {"w": jnp.ones(2)}
    loop.run_epoch(params, optax.sgd(0.0).init(params), 0)
    jax.effects_barrier()

    assert len(seen) == 8  # 8 target batches -> 8 source batches
    cycles = [sum(seen[2 * c : 2 * c + 2], []) for c in range(4)]
    for c in cycles:  # every cycle covers the full source exactly once
        assert sorted(c) == list(range(1, src_n + 1)), c
    # ... but in a FRESH order (probability all four orders coincide under
    # the old re-walk bug is 0; under correct reshuffling ~ (1/8!)^3)
    assert len({tuple(c) for c in cycles}) > 1, cycles


def test_epoch_permutations_differ_across_epochs():
    train_data = _make_loop_data(8, 32, 4)
    seen = []

    def collect(iids):
        seen.append(tuple(np.asarray(iids).tolist()))

    def loss_fn(params, b, rng=None):
        jax.debug.callback(collect, b["source_item_id"], ordered=True)
        return 0.0 * jnp.sum(params["w"])

    loop = DeviceEpochLoop(
        TrainMode.BOTH, loss_fn, optax.sgd(0.0), train_data,
        InputType.PAIRWISE, neg_num=1, num_users=3,
        base_rng=jax.random.PRNGKey(5),
    )
    params = {"w": jnp.ones(2)}
    opt = optax.sgd(0.0).init(params)
    params, opt, _ = loop.run_epoch(params, opt, 0)
    params, opt, _ = loop.run_epoch(params, opt, 1)
    jax.effects_barrier()
    assert seen[:8] != seen[8:16]


# ------------------------------------------------------ popularity sampling


def test_device_popularity_sampler_matches_distribution():
    """Device alias-table draws follow the item-popularity law (checked on a
    user with empty history so rejection can't distort frequencies)."""
    n_items = 41
    counts = {1: 32, 2: 16, 3: 8, 4: 4, 5: 2, 6: 2}  # skewed popularity
    iids = np.concatenate([np.full(c, i) for i, c in counts.items()])
    table = InteractionTable(
        {
            "target_user_id": np.ones(len(iids), dtype=np.int64),
            "target_item_id": iids.astype(np.int64),
        },
        uid_field="target_user_id",
        iid_field="target_item_id",
        label_field="target_label",
        neg_prefix="neg_",
    )
    sampler = DomainNegSampler(
        ["train"], [table], num_items=n_items, distribution="popularity"
    ).set_phase("train")
    from recbole_cdr_tpu.trainer.device_loop import DomainDeviceData

    dd = DomainDeviceData(table, sampler, num_users=3)
    assert dd.alias is not None
    hist = jnp.full((3, 1), n_items, jnp.int32)  # user 2: empty history
    uids = jnp.full(16000, 2, jnp.int32)
    neg = np.asarray(
        _sample_negatives(jax.random.PRNGKey(11), uids, hist, dd.candidates,
                          1, alias=dd.alias)
    )
    freq = np.bincount(neg, minlength=n_items)
    total_c = sum(counts.values())
    for item, c in counts.items():
        expected = len(neg) * c / total_c
        assert abs(freq[item] - expected) < expected * 0.2 + 30, (item, freq[item], expected)
    assert freq[7:].sum() == 0  # only interacted items have popularity mass


def test_device_popularity_negatives_avoid_history():
    n_items = 41
    # user 2's history is the LOW-mass item 5 (popularity 2/32):
    # false-negative prob per slot = (2/32)^16 ~ 1e-20
    iids = np.concatenate([np.full(16, 1), np.full(8, 2), np.full(4, 3),
                           [4, 4, 5, 5]])
    uids_tbl = np.ones(len(iids), dtype=np.int64)
    uids_tbl[-2:] = 2  # user 2 interacted with item 5
    table = InteractionTable(
        {"target_user_id": uids_tbl, "target_item_id": iids.astype(np.int64)},
        uid_field="target_user_id", iid_field="target_item_id",
        label_field="target_label", neg_prefix="neg_",
    )
    sampler = DomainNegSampler(
        ["train"], [table], num_items=n_items, distribution="popularity"
    ).set_phase("train")
    from recbole_cdr_tpu.trainer.device_loop import DomainDeviceData, _device_hist

    dd = DomainDeviceData(table, sampler, num_users=3)
    hist = jnp.asarray(_device_hist(sampler.used, 3)[0])
    uids = jnp.full(4000, 2, jnp.int32)
    neg = np.asarray(
        _sample_negatives(jax.random.PRNGKey(4), uids, hist, dd.candidates,
                          1, alias=dd.alias)
    )
    assert (neg != 5).all()


def test_popularity_device_loop_e2e():
    from recbole_cdr_tpu.quick_start import objective_function

    r = objective_function(config_dict={
        "model": "CMF", "state": "ERROR", "show_progress": False,
        "train_batch_size": 512, "eval_batch_size": 2048,
        "train_epochs": ["BOTH:1"],
        "neg_sampling": {"popularity": 1},
    }, saved=False)
    assert 0.0 <= r["test_result"]["recall@10"] <= 1.0
