"""Golden tests for the sectioned ID-remap invariant and split semantics —
the load-bearing correctness layer every model and sampler depends on."""

import os

import numpy as np
import pytest

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import (
    CrossDomainDataset,
    calcu_split_ids,
    interval_mask,
    parse_interval,
)
from recbole_cdr_tpu.utils import init_seed


@pytest.fixture(scope="module")
def dataset():
    config = CDRConfig(model="CMF", config_dict={}, _cli_args=[])
    init_seed(config["seed"], True)
    return CrossDomainDataset(config)


def test_interval_parsing():
    assert parse_interval("[5,inf)") == (5.0, float("inf"), True, False)
    assert parse_interval("(0,10]") == (0.0, 10.0, False, True)
    v = np.array([1, 3, 5, 7])
    assert interval_mask(v, "[3,inf)").tolist() == [False, True, True, True]
    assert interval_mask(v, "(3,7)").tolist() == [False, False, True, False]


def test_calcu_split_ids_matches_recbole():
    # recbole 1.0.1 semantics: remainder to part 0, fractional parts >0 and <1
    # borrow one from part 0
    assert calcu_split_ids(10, [0.8, 0.1, 0.1]) == [8, 9]
    assert calcu_split_ids(5, [0.8, 0.1, 0.1]) == [3, 4]
    assert calcu_split_ids(3, [0.8, 0.1, 0.1]) == [1, 2]
    assert calcu_split_ids(20, [0.8, 0.2]) == [16]


def test_sectioned_id_space(dataset):
    ds = dataset
    # PAD + overlap + target_only + source_only partitions the space
    assert ds.num_total_user == (
        ds.num_overlap_user + ds.num_source_only_user + ds.num_target_only_user
    )
    assert ds.num_total_item == (
        ds.num_overlap_item + ds.num_source_only_item + ds.num_target_only_item
    )
    # bundled pair overlaps on items, not users (prefixed user tokens)
    assert ds.num_overlap_user == 1
    assert ds.num_overlap_item > 1


def test_id_sections_are_contiguous(dataset):
    ds = dataset
    src = ds.source_domain_dataset
    tgt = ds.target_domain_dataset

    tgt_items = tgt.arrays[tgt.iid_field]
    target_num_items = ds.num_overlap_item + ds.num_target_only_item
    # every target item id lives in the contiguous prefix [1, target_num_items)
    assert tgt_items.min() >= 1
    assert tgt_items.max() < target_num_items

    src_items = src.arrays[src.iid_field]
    # source ids are either in the overlap prefix or the source-only suffix
    in_overlap = src_items < ds.num_overlap_item
    in_source_only = src_items >= ds.num_overlap_item + ds.num_target_only_item
    assert np.all(in_overlap | in_source_only)


def test_overlap_tokens_sorted_and_consistent(dataset):
    ds = dataset
    # overlapped ids [1, n_overlap) map to the same token in both domains
    src_tokens = ds.source_domain_dataset.field2id_token[
        ds.source_domain_dataset.iid_field
    ]
    tgt_tokens = ds.target_domain_dataset.field2id_token[
        ds.target_domain_dataset.iid_field
    ]
    n_ov = ds.num_overlap_item
    assert src_tokens[:n_ov] == tgt_tokens[:n_ov]
    assert src_tokens[0] == "[PAD]"
    # overlap section sorted by raw token
    assert src_tokens[1:n_ov] == sorted(src_tokens[1:n_ov])


def test_domain_num_counts(dataset):
    ds = dataset
    src = ds.source_domain_dataset
    tgt = ds.target_domain_dataset
    assert src.num(src.iid_field) == ds.num_overlap_item + ds.num_source_only_item
    assert tgt.num(tgt.iid_field) == ds.num_overlap_item + ds.num_target_only_item


def test_inter_num_filter_applied(dataset):
    # [5,inf) intervals: every user and item has >= 5 interactions
    for dom in (dataset.source_domain_dataset, dataset.target_domain_dataset):
        uids = dom.arrays[dom.uid_field]
        iids = dom.arrays[dom.iid_field]
        ucounts = np.bincount(uids)
        icounts = np.bincount(iids)
        assert ucounts[ucounts > 0].min() >= 5
        assert icounts[icounts > 0].min() >= 5


def test_build_split_partitions(dataset):
    parts = dataset.build()
    src_train, src_valid, tgt_train, tgt_valid, tgt_test = parts
    assert src_valid is None  # CMF has no SOURCE phase
    total = len(tgt_train) + len(tgt_valid) + len(tgt_test)
    assert total == dataset.target_domain_dataset.inter_num
    # grouped 8:1:1 split: train largest
    assert len(tgt_train) > len(tgt_valid)
    assert len(tgt_train) > len(tgt_test)
    # no overlap between split rows per user: all parts disjoint by construction


def test_history_matrix(dataset):
    ds = dataset
    hist, vals, lens = ds.history_item_matrix(domain="target")
    tgt = ds.target_domain_dataset
    uids = tgt.arrays[tgt.uid_field]
    iids = tgt.arrays[tgt.iid_field]
    counts = np.bincount(uids, minlength=ds.num_total_user)
    assert np.array_equal(lens, counts)
    # row contents match the user's interacted item multiset
    u = uids[0]
    expected = np.sort(iids[uids == u])
    got = np.sort(hist[u, : lens[u]])
    assert np.array_equal(expected, got)


def test_sparse_matrix(dataset):
    mat = dataset.inter_matrix(form="coo", domain="target")
    assert mat.shape == (dataset.num_total_user, dataset.num_total_item)
    assert mat.nnz == dataset.target_domain_dataset.inter_num
