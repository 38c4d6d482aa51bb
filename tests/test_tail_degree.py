"""Tail-degree robustness (VERDICT r3 missing #2): users whose degree exceeds
the device membership-matrix width cap must still get false-negative-free
negatives (via exact complement lists), and the fused evaluator's history
structures must scale with the SUM of degrees, not the max.

Reference behavior being matched: the host sampler's exact-complement
fallback / per-user python sets (`crossdomain_sampler.py:139-175,229-250`).
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import recbole_cdr_tpu.trainer.device_loop as dl
from recbole_cdr_tpu.data.batching import (
    FullSortEvalBatches,
    OverlapBatcher,
    TrainBatcher,
)
from recbole_cdr_tpu.data.dataset import InteractionTable, OverlapTable
from recbole_cdr_tpu.sampler import DomainNegSampler
from recbole_cdr_tpu.utils.enums import InputType, TrainMode


def _table(prefix, uids, iids):
    return InteractionTable(
        {
            f"{prefix}_user_id": np.asarray(uids, np.int64),
            f"{prefix}_item_id": np.asarray(iids, np.int64),
        },
        uid_field=f"{prefix}_user_id",
        iid_field=f"{prefix}_item_id",
        label_field=f"{prefix}_label",
        neg_prefix="neg_",
    )


def test_heavy_user_complement_sampling(monkeypatch):
    """A user past the cap samples uniformly from their exact complement;
    light users keep the rejection path."""
    monkeypatch.setattr(dl, "HIST_WIDTH_CAP", 16)
    num_items = 201  # candidates 1..200
    rng = np.random.default_rng(0)
    heavy_items = rng.choice(np.arange(1, num_items), 150, replace=False)
    light_items = [3, 7]
    uids = np.concatenate([np.full(150, 1), np.full(2, 2)])
    iids = np.concatenate([heavy_items, light_items])
    t = _table("target", uids, iids)
    sampler = DomainNegSampler(["train"], [t], num_items=num_items).set_phase("train")
    dd = dl.DomainDeviceData(t, sampler, num_users=3)

    assert np.asarray(dd.hist).shape[1] <= 16
    assert dd.heavy is not None
    hidx, offs, lens, concat = (np.asarray(a) for a in dd.heavy)
    assert hidx[1] == 0 and hidx[2] == -1
    complement = np.setdiff1d(sampler.candidate_ids, heavy_items)
    assert lens[0] == len(complement)
    np.testing.assert_array_equal(np.sort(concat[: lens[0]]), complement)

    draw_uids = jnp.asarray(np.tile([1, 2], 4000), jnp.int32)
    neg = np.asarray(
        dl._sample_negatives(
            jax.random.PRNGKey(3), draw_uids, dd.hist, dd.candidates, 1,
            cand_ranges=dd.cand_ranges, heavy=dd.heavy,
        )
    )
    heavy_draws = neg[::2]
    light_draws = neg[1::2]
    heavy_set = set(heavy_items.tolist())
    assert not (set(heavy_draws.tolist()) & heavy_set)  # false-negative-free
    assert not (set(light_draws.tolist()) & {3, 7})
    # roughly uniform over the 51-item complement
    freq = np.bincount(heavy_draws, minlength=num_items)[complement]
    expected = len(heavy_draws) / len(complement)
    assert freq.min() > 0.3 * expected and freq.max() < 2.5 * expected


def test_degree_20k_device_loop(monkeypatch):
    """A 20k-degree user runs the device epoch loop with the membership
    matrix bounded by the cap (VERDICT r3 next-round #3)."""
    num_items = 25001
    rng = np.random.default_rng(1)
    heavy = rng.choice(np.arange(1, num_items), 20000, replace=False)
    light_uids = np.repeat(np.arange(2, 10), 5)
    light_iids = rng.integers(1, num_items, len(light_uids))
    uids = np.concatenate([np.full(20000, 1), light_uids])
    iids = np.concatenate([heavy, light_iids])

    def half(prefix):
        return _table(prefix, uids, iids)

    src_t, tgt_t = half("source"), half("target")
    src_s = DomainNegSampler(["train"], [src_t], num_items=num_items).set_phase("train")
    tgt_s = DomainNegSampler(["train"], [tgt_t], num_items=num_items).set_phase("train")
    batch = 512
    train_data = SimpleNamespace(
        source_batcher=TrainBatcher(src_t, src_s, InputType.PAIRWISE, 1, batch),
        target_batcher=TrainBatcher(tgt_t, tgt_s, InputType.PAIRWISE, 1, batch),
        overlap_batcher=OverlapBatcher(OverlapTable(4), 4),
    )

    def loss_fn(params, b, rng=None):
        return jnp.sum(params["w"]) * 0.0 + jnp.float32(1.0)

    loop = dl.DeviceEpochLoop(
        TrainMode.TARGET, loss_fn, optax.sgd(0.1), train_data,
        InputType.PAIRWISE, neg_num=1, num_users=10,
        base_rng=jax.random.PRNGKey(5),
    )
    assert np.asarray(loop.tgt.hist).shape[1] <= dl.HIST_WIDTH_CAP
    assert loop.tgt.heavy is not None
    params = {"w": jnp.ones(2)}
    p, o, loss = loop.run_epoch(params, optax.sgd(0.1).init(params), 0)
    assert np.isfinite(float(loss))


def test_heavy_parity_vs_host_sampler(monkeypatch):
    """Device complement draws target the same distribution as the host
    sampler's candidates-minus-used for the heavy user."""
    monkeypatch.setattr(dl, "HIST_WIDTH_CAP", 8)
    num_items = 61
    used = np.arange(1, 51)  # user 1 used items 1..50 -> complement 51..60
    t = _table("target", np.full(50, 1), used)
    sampler = DomainNegSampler(["train"], [t], num_items=num_items).set_phase("train")
    dd = dl.DomainDeviceData(t, sampler, num_users=2)
    draw_uids = jnp.full((6000,), 1, jnp.int32)
    neg = np.asarray(
        dl._sample_negatives(
            jax.random.PRNGKey(11), draw_uids, dd.hist, dd.candidates, 1,
            cand_ranges=dd.cand_ranges, heavy=dd.heavy,
        )
    )
    assert set(neg.tolist()) == set(range(51, 61))
    freq = np.bincount(neg, minlength=num_items)[51:61]
    expected = len(neg) / 10
    assert freq.min() > 0.7 * expected and freq.max() < 1.4 * expected


def test_eval_pair_lists_bounded_by_sum_not_max():
    """_fused_eval_arrays / _stream_eval_pairs widths track the tile pair
    SUM: one 5k-degree user must not widen every row to 5k."""
    from recbole_cdr_tpu.evaluator.evaluator import (
        _fused_eval_arrays,
        _stream_eval_pairs,
    )

    U, B = 64, 16
    rng = np.random.default_rng(2)
    item_num = 8000
    lens = np.full(U, 3)
    lens[5] = 5000  # tail user
    hist_ptr = np.concatenate([[0], np.cumsum(lens)])
    hist_items = rng.integers(1, item_num, hist_ptr[-1])
    eb = SimpleNamespace(
        uid_list=np.arange(1, U + 1),
        hist_ptr=hist_ptr,
        hist_items=hist_items,
        item_num=item_num,
        user_batch=B,
        pos_lens=np.full(U, 2),
        pos_ptr=np.concatenate([[0], np.cumsum(np.full(U, 2))]),
        pos_items=rng.integers(1, item_num, 2 * U),
    )
    uids, hrows, hitems, hvalid = _fused_eval_arrays(eb, False, U, B)
    # pair budget = heaviest TILE's pair sum (5000 + 15*3), not U x 5000
    assert hrows.shape == (U // B, 5000 + 45)
    # scatter targets reproduce the CSR content exactly
    got = set()
    hr, hi, hv = np.asarray(hrows), np.asarray(hitems), np.asarray(hvalid)
    for tidx in range(U // B):
        for p in range(hr.shape[1]):
            if hv[tidx, p]:
                got.add((tidx * B + hr[tidx, p], hi[tidx, p], ))
    want = set()
    for u in range(U):
        for j in range(hist_ptr[u], hist_ptr[u + 1]):
            want.add((u, hist_items[j]))
    assert got == want

    uids2, srows, sitems, svalid = _stream_eval_pairs(eb, U, B, 1024)
    n_it = -(-item_num // 1024)
    assert srows.shape[0] == U // B and srows.shape[1] == n_it
    # every pair lands in its own item tile's list
    sr, si, sv = np.asarray(srows), np.asarray(sitems), np.asarray(svalid)
    got2 = set()
    for ut in range(U // B):
        for it in range(n_it):
            for p in range(sr.shape[2]):
                if sv[ut, it, p]:
                    assert si[ut, it, p] // 1024 == it
                    got2.add((ut * B + sr[ut, it, p], si[ut, it, p]))
    assert got2 == want
