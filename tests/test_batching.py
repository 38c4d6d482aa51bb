"""Dataloader state-machine tests: the four modes, static shapes, padding
masks, BOTH-mode source cycling."""

import numpy as np
import pytest

from recbole_cdr_tpu.data.batching import OverlapBatcher, TrainBatcher
from recbole_cdr_tpu.data.dataset import InteractionTable, OverlapTable
from recbole_cdr_tpu.sampler import DomainNegSampler
from recbole_cdr_tpu.utils.enums import InputType


def make_table(n, prefix="target"):
    rng = np.random.default_rng(0)
    return InteractionTable(
        {
            f"{prefix}_user_id": rng.integers(1, 20, n).astype(np.int64),
            f"{prefix}_item_id": rng.integers(1, 50, n).astype(np.int64),
        },
        uid_field=f"{prefix}_user_id",
        iid_field=f"{prefix}_item_id",
        label_field=f"{prefix}_label",
        neg_prefix="neg_",
    )


def make_sampler(table):
    return DomainNegSampler(["train"], [table], num_items=60).set_phase("train")


def test_pointwise_batch_layout():
    table = make_table(100)
    b = TrainBatcher(table, make_sampler(table), InputType.POINTWISE, neg_num=1, batch_size=64)
    assert b.step == 32
    b.reset()
    batch = b.next_batch()
    assert batch["target_user_id"].shape == (64,)
    # first half positive labels, second half negative
    assert batch["target_label"][:32].tolist() == [1.0] * 32
    assert batch["target_label"][32:].tolist() == [0.0] * 32
    # pos and neg rows share users
    np.testing.assert_array_equal(batch["target_user_id"][:32], batch["target_user_id"][32:])


def test_pointwise_last_batch_padded():
    table = make_table(40)
    b = TrainBatcher(table, make_sampler(table), InputType.POINTWISE, neg_num=1, batch_size=64)
    b.reset()
    b.next_batch()
    batch2 = b.next_batch()  # 8 real positives remain of 40
    assert batch2["target_user_id"].shape == (64,)
    w = batch2["target_sample_weight"]
    assert w[:8].tolist() == [1.0] * 8
    assert w[8:32].tolist() == [0.0] * 24
    assert w[32:40].tolist() == [1.0] * 8  # tiled mask over the neg block


def test_pairwise_batch_layout():
    table = make_table(100)
    b = TrainBatcher(table, make_sampler(table), InputType.PAIRWISE, neg_num=1, batch_size=50)
    assert b.step == 50
    b.reset()
    batch = b.next_batch()
    assert "neg_target_item_id" in batch
    assert batch["target_item_id"].shape == (50,)
    assert batch["neg_target_item_id"].shape == (50,)


def test_overlap_batcher():
    b = OverlapBatcher(OverlapTable(25), batch_size=10)
    b.reset()
    seen = []
    for _ in range(len(b)):
        batch = b.next_batch()
        assert batch["overlap"].shape == (10,)
        seen.extend(batch["overlap"][batch["overlap_sample_weight"] > 0].tolist())
    assert sorted(seen) == list(range(25))


def test_both_mode_epoch_length(monkeypatch):
    """BOTH epochs are len(target loader) batches with the source cycling."""
    from recbole_cdr_tpu.data.batching import CrossDomainLoader
    from recbole_cdr_tpu.utils.enums import TrainMode

    src = make_table(30, "source")
    tgt = make_table(120, "target")

    class Cfg(dict):
        def __getitem__(self, k):
            return self.get(k)

    cfg = Cfg(
        MODEL_INPUT_TYPE=InputType.POINTWISE,
        train_neg_sample_args={"strategy": "by", "by": 1, "distribution": "uniform"},
        train_batch_size=32,
        overlap_batch_size=10,
    )

    class FakeDS:
        overlap_dataset = OverlapTable(7)

    loader = CrossDomainLoader(cfg, FakeDS(), src, make_sampler(src), tgt, make_sampler(tgt))
    loader.set_mode(TrainMode.BOTH)
    batches = list(loader)
    assert len(batches) == len(loader.target_batcher)
    for b in batches:
        assert "source_user_id" in b and "target_user_id" in b
    # state change after a full epoch is legal
    loader.set_mode(TrainMode.SOURCE)
    assert len(list(loader)) == len(loader.source_batcher)
    loader.set_mode(TrainMode.OVERLAP)
    assert len(list(loader)) == 1
