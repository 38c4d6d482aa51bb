"""Sampler unit tests: rejection correctness, candidate restriction,
distribution shape — the unit layer the reference lacks (SURVEY §4)."""

import numpy as np
import pytest

from recbole_cdr_tpu.data.dataset import InteractionTable
from recbole_cdr_tpu.sampler import DomainNegSampler, UsedIds
from recbole_cdr_tpu.sampler.sampler import _AliasTable


def make_table(uids, iids):
    return InteractionTable(
        {
            "target_user_id": np.array(uids, dtype=np.int64),
            "target_item_id": np.array(iids, dtype=np.int64),
        },
        uid_field="target_user_id",
        iid_field="target_item_id",
        label_field="target_label",
        neg_prefix="neg_",
    )


def test_used_ids_membership():
    used = UsedIds(np.array([1, 1, 2]), np.array([3, 4, 3]), num_items=10)
    assert used.contains(np.array([1, 1, 2, 2]), np.array([3, 5, 3, 4])).tolist() == [
        True, False, True, False,
    ]
    assert used.history_of(1).tolist() == [3, 4]
    assert used.history_of(5).tolist() == []


def test_uniform_sampler_avoids_used():
    # user 1 interacted with items 1..8 of 10 (PAD=0); only 9 remains
    uids = np.ones(8, dtype=np.int64)
    iids = np.arange(1, 9)
    sampler = DomainNegSampler(["train"], [make_table(uids, iids)], num_items=10).set_phase("train")
    neg = sampler.sample_by_user_ids(np.array([1] * 50), num=1)
    assert (neg == 9).all()


def test_sampler_full_interaction_raises():
    uids = np.ones(9, dtype=np.int64)
    iids = np.arange(1, 10)
    with pytest.raises(ValueError):
        DomainNegSampler(["train"], [make_table(uids, iids)], num_items=10)


def test_cumulative_phases():
    train = make_table([1, 1], [1, 2])
    valid = make_table([1], [3])
    sampler = DomainNegSampler(["train", "valid"], [train, valid], num_items=6)
    train_s = sampler.set_phase("train")
    valid_s = sampler.set_phase("valid")
    # item 3 is allowed as a train negative but not a valid negative
    assert not train_s.used.contains(np.array([1]), np.array([3]))[0]
    assert valid_s.used.contains(np.array([1]), np.array([3]))[0]


def test_popularity_alias_table():
    candidates = np.array([1] * 80 + [2] * 15 + [3] * 5)
    table = _AliasTable(candidates)
    rng = np.random.default_rng(0)
    draws = table.sample(20000, rng)
    freq = np.bincount(draws, minlength=4)[1:] / 20000
    np.testing.assert_allclose(freq, [0.8, 0.15, 0.05], atol=0.02)


def test_source_sampler_candidate_restriction():
    """Source negatives must come from the overlap prefix or source-only
    suffix, never the target-only section."""
    from recbole_cdr_tpu.sampler import CrossDomainSourceSampler

    class FakeCD:
        num_overlap_item = 3      # ids 1,2 overlap (+PAD)
        num_target_only_item = 4  # ids 3..6
        num_source_only_item = 3  # ids 7..9
        num_total_item = 10
        num_overlap_user = 1
        num_target_only_user = 2
        num_source_only_user = 3
        num_total_user = 6

    t = InteractionTable(
        {
            "source_user_id": np.array([3, 3], dtype=np.int64),
            "source_item_id": np.array([7, 8], dtype=np.int64),
        },
        uid_field="source_user_id",
        iid_field="source_item_id",
        label_field="source_label",
        neg_prefix="neg_",
    )
    sampler = CrossDomainSourceSampler(["train"], FakeCD(), [t]).set_phase("train")
    neg = sampler.sample_by_user_ids(np.array([3] * 200), num=1)
    target_only = set(range(3, 7))
    assert not (set(neg.tolist()) & target_only)
    assert not set(neg.tolist()) & {7, 8}  # used pairs rejected
    assert set(neg.tolist()) <= {1, 2, 9}
