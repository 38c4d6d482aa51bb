"""Batch pipeline: the four-state cross-domain dataloader.

Capability parity with `recbole_cdr/data/dataloader.py:25-248` plus recbole's
``TrainDataLoader`` negative-sample batch construction, redesigned for XLA:
every batch of a given loader has the SAME static shape (the last partial
batch is padded, with a 0/1 ``*_sample_weight`` mask), so each training phase
compiles exactly one program.

States (reference `recbole_cdr/utils/enum_type.py:27-45`):
- BOTH: zip of a target batch and a cycling source batch (epoch length =
  number of target batches, source restarts on exhaustion)
- SOURCE / TARGET: that domain alone
- OVERLAP: shuffled batches of overlapped-entity IDs
"""

from typing import Dict, Iterator, Optional

import numpy as np

from recbole_cdr_tpu.data.dataset import InteractionTable, OverlapTable
from recbole_cdr_tpu.utils.enums import InputType, TrainMode


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if len(arr) == n:
        return arr
    pad = np.zeros((n - len(arr),) + arr.shape[1:], dtype=arr.dtype)
    return np.concatenate([arr, pad])


class TrainBatcher:
    """Fixed-shape training batches for one domain with on-the-fly negative
    sampling.

    POINTWISE (label 0/1): a batch carries ``step`` positive rows followed by
    ``step * neg_num`` negative copies, label ``[1...1, 0...0]`` — the layout
    recbole's pointwise neg-sampling produces, padded to static shape.
    PAIRWISE: ``step`` rows with an extra ``neg_<iid>`` field.
    """

    def __init__(self, table: InteractionTable, sampler, input_type: InputType,
                 neg_num: int, batch_size: int, shuffle: bool = True):
        self.table = table
        self.sampler = sampler
        self.input_type = input_type
        self.neg_num = neg_num if sampler is not None else 0
        self.shuffle = shuffle
        if input_type == InputType.POINTWISE and self.neg_num > 0:
            self.times = 1 + self.neg_num
            self.step = max(batch_size // self.times, 1)
        else:
            self.times = 1
            self.step = batch_size
        self.domain = table.uid_field.split("_", 1)[0]
        self.weight_field = self.domain + "_sample_weight"
        self.neg_iid_field = table.neg_prefix + table.iid_field
        self.pr = 0
        self._order = np.arange(len(table))

    def __len__(self):
        return max(1, (len(self.table) + self.step - 1) // self.step) if len(self.table) else 0

    @property
    def pr_end(self):
        return len(self.table)

    def reset(self):
        self.pr = 0
        if self.shuffle:
            np.random.shuffle(self._order)

    def next_batch(self) -> Dict[str, np.ndarray]:
        idx = self._order[self.pr:self.pr + self.step]
        self.pr += self.step
        n_real = len(idx)
        uid = _pad_to(self.table[self.table.uid_field][idx], self.step)
        iid = _pad_to(self.table[self.table.iid_field][idx], self.step)
        weight = _pad_to(np.ones(n_real, dtype=np.float32), self.step)

        batch = {}
        if self.neg_num > 0:
            neg = self.sampler.sample_by_user_ids(uid, self.neg_num)
            if self.input_type == InputType.POINTWISE:
                # [pos block | neg block(s)] with 0/1 labels
                full_uid = np.tile(uid, self.times)
                full_iid = np.concatenate([iid, neg])
                label = np.zeros(self.step * self.times, dtype=np.float32)
                label[: self.step] = 1.0
                full_weight = np.tile(weight, self.times)
                batch[self.table.uid_field] = full_uid
                batch[self.table.iid_field] = full_iid
                batch[self.table.label_field] = label
                batch[self.weight_field] = full_weight
            else:  # PAIRWISE
                batch[self.table.uid_field] = uid
                batch[self.table.iid_field] = iid
                batch[self.neg_iid_field] = neg
                batch[self.weight_field] = weight
        else:
            batch[self.table.uid_field] = uid
            batch[self.table.iid_field] = iid
            if self.table.label_field in self.table.arrays:
                batch[self.table.label_field] = _pad_to(
                    self.table[self.table.label_field][idx].astype(np.float32), self.step
                )
            batch[self.weight_field] = weight
        return batch


class OverlapBatcher:
    """Batches of shuffled overlapped-entity IDs (reference
    ``OverlapDataloader``, `dataloader.py:25-52`)."""

    def __init__(self, overlap: OverlapTable, batch_size: int, shuffle: bool = True):
        self.overlap = overlap
        self.step = batch_size
        self.shuffle = shuffle
        self.pr = 0

    def __len__(self):
        return max(1, (len(self.overlap) + self.step - 1) // self.step)

    @property
    def pr_end(self):
        return len(self.overlap)

    def reset(self):
        self.pr = 0
        if self.shuffle:
            self.overlap.shuffle()

    def next_batch(self) -> Dict[str, np.ndarray]:
        ids = self.overlap.ids[self.pr:self.pr + self.step]
        self.pr += self.step
        n_real = len(ids)
        return {
            "overlap": _pad_to(ids, self.step),
            "overlap_sample_weight": _pad_to(np.ones(n_real, dtype=np.float32), self.step),
        }


class CrossDomainLoader:
    """The four-state train loader (reference ``CrossDomainDataloader``,
    `dataloader.py:55-186`)."""

    def __init__(self, config, dataset, source_table, source_sampler,
                 target_table, target_sampler, shuffle: bool = True):
        input_type = config["MODEL_INPUT_TYPE"]
        neg_num = (
            config["train_neg_sample_args"].get("by", 0)
            if config["train_neg_sample_args"]["strategy"] == "by"
            else 0
        )
        bs = config["train_batch_size"]
        self.source_batcher = TrainBatcher(
            source_table, source_sampler, input_type, neg_num, bs, shuffle
        )
        self.target_batcher = TrainBatcher(
            target_table, target_sampler, input_type, neg_num, bs, shuffle
        )
        overlap_bs = config["overlap_batch_size"] or 100
        self.overlap_batcher = OverlapBatcher(dataset.overlap_dataset, overlap_bs, shuffle)
        self.dataset = dataset
        self.state = TrainMode.BOTH

    def set_mode(self, state: TrainMode):
        if not isinstance(state, TrainMode):
            raise NotImplementedError(f"Cross Domain data loader has no state named [{state}].")
        if self.source_batcher.pr != 0 or self.target_batcher.pr != 0:
            raise PermissionError("Cannot change dataloader's state within an epoch")
        self.state = state

    def _active(self):
        if self.state == TrainMode.SOURCE:
            return self.source_batcher
        if self.state == TrainMode.OVERLAP:
            return self.overlap_batcher
        return self.target_batcher

    def __len__(self):
        return len(self._active())

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.state == TrainMode.BOTH:
            self.source_batcher.reset()
            self.target_batcher.reset()
            for _ in range(len(self.target_batcher)):
                if self.source_batcher.pr >= self.source_batcher.pr_end:
                    self.source_batcher.reset()
                source_data = self.source_batcher.next_batch()
                target_data = self.target_batcher.next_batch()
                target_data.update(source_data)
                yield target_data
        elif self.state == TrainMode.SOURCE:
            self.source_batcher.reset()
            for _ in range(len(self.source_batcher)):
                yield self.source_batcher.next_batch()
        elif self.state == TrainMode.TARGET:
            self.target_batcher.reset()
            for _ in range(len(self.target_batcher)):
                yield self.target_batcher.next_batch()
        else:  # OVERLAP
            self.overlap_batcher.reset()
            for _ in range(len(self.overlap_batcher)):
                yield self.overlap_batcher.next_batch()
        # leave pointers at 0 so set_mode() between phases is legal (the
        # reference resets them on StopIteration, `dataloader.py:114-126`)
        self.source_batcher.pr = 0
        self.target_batcher.pr = 0
        self.overlap_batcher.pr = 0


class FullSortEvalBatches:
    """Full-sort evaluation batches: users of the eval split with their
    positive-item and history-item lists in CSR form.

    For the source-domain variant, item IDs are re-compacted into the dense
    source item space by subtracting ``num_target_only_item`` from source-only
    IDs (reference ``CrossDomainFullSortEvalDataLoader``,
    `dataloader.py:189-248`).
    """

    def __init__(self, table: InteractionTable, sampler, item_num: int,
                 eval_batch_size: int, compact: Optional[tuple] = None):
        uids = table[table.uid_field]
        iids = table[table.iid_field]
        self.item_num = item_num
        self.uid_field = table.uid_field

        # users in encounter order of sorted uid (stable)
        order = np.argsort(uids, kind="stable")
        s_uids, s_iids = uids[order], iids[order]
        uniq, start_idx = np.unique(s_uids, return_index=True)
        # np.unique sorts ascending — matches the reference's sort-by-uid scan
        self.uid_list = uniq.astype(np.int64)

        if compact is not None:
            overlap_num, revoke_num = compact
            s_iids = np.where(s_iids < overlap_num, s_iids, s_iids - revoke_num)

        counts = np.diff(np.concatenate([start_idx, [len(s_uids)]]))
        self.pos_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.pos_items = s_iids.astype(np.int64)

        # history = used_ids(phase) minus positives of this split, computed
        # fully vectorized over sorted (user, item) keys
        if sampler is not None and len(self.uid_list):
            used_keys = sampler.used.keys
            owner_uid = used_keys // sampler.used.num_items
            used_iid = used_keys % sampler.used.num_items
            # restrict to eval users
            loc = np.searchsorted(self.uid_list, owner_uid)
            loc = np.minimum(loc, len(self.uid_list) - 1)
            mask = self.uid_list[loc] == owner_uid
            order_idx = loc[mask]            # position of user in uid_list
            used_iid = used_iid[mask]
            if compact is not None:
                overlap_num, revoke_num = compact
                used_iid = np.where(used_iid < overlap_num, used_iid, used_iid - revoke_num)
            used_pair = order_idx * item_num + used_iid
            pos_pair = (
                np.repeat(np.arange(len(self.uid_list), dtype=np.int64), counts)
                * item_num + self.pos_items
            )
            hist_pair = np.setdiff1d(used_pair, pos_pair)
            hist_owner = hist_pair // item_num
            self.hist_items = (hist_pair % item_num).astype(np.int64)
            hist_counts = np.bincount(hist_owner, minlength=len(self.uid_list))
            self.hist_ptr = np.concatenate([[0], np.cumsum(hist_counts)]).astype(np.int64)
        else:
            self.hist_items = np.array([], np.int64)
            self.hist_ptr = np.zeros(len(self.uid_list) + 1, dtype=np.int64)

        # eval_batch_size caps the score-matrix footprint (recbole semantics);
        # the floor of 32 users keeps device dispatches MXU-sized on TPU
        self.user_batch = max(1, min(32, len(self.uid_list)) or 1,
                              eval_batch_size // max(item_num, 1))
        self.max_hist = int(
            (self.hist_ptr[1:] - self.hist_ptr[:-1]).max() if len(self.uid_list) else 0
        )

    def __len__(self):
        return (len(self.uid_list) + self.user_batch - 1) // self.user_batch

    def __iter__(self):
        """Yields (user_ids[B], history_padded[B, H], history_mask[B, H],
        n_real) with static shapes (last batch padded). The CSR->padded fill
        is vectorized (one scatter per batch) — the per-row python loop cost
        dominated eval wall time at production batch sizes."""
        B = self.user_batch
        H = max(self.max_hist, 1)
        for start in range(0, len(self.uid_list), B):
            uids = self.uid_list[start:start + B]
            n_real = len(uids)
            hist = np.zeros((B, H), dtype=np.int64)
            hist_mask = np.zeros((B, H), dtype=bool)
            lo = self.hist_ptr[start]
            hi = self.hist_ptr[start + n_real]
            if hi > lo:
                lens = (self.hist_ptr[start + 1:start + n_real + 1]
                        - self.hist_ptr[start:start + n_real])
                owners = np.repeat(np.arange(n_real), lens)
                pos_in_row = np.arange(hi - lo) - np.repeat(
                    self.hist_ptr[start:start + n_real] - lo, lens
                )
                hist[owners, pos_in_row] = self.hist_items[lo:hi]
                hist_mask[owners, pos_in_row] = True
            yield _pad_to(uids, B), hist, hist_mask, n_real

    def positives_of(self, k: int) -> np.ndarray:
        return self.pos_items[self.pos_ptr[k]:self.pos_ptr[k + 1]]

    @property
    def pos_lens(self) -> np.ndarray:
        return (self.pos_ptr[1:] - self.pos_ptr[:-1]).astype(np.int64)

    @property
    def pos_keys_sorted(self) -> np.ndarray:
        """Sorted ``user_order_index * item_num + item`` keys of all positives —
        lets a whole batch's top-k hit flags come from ONE searchsorted."""
        if not hasattr(self, "_pos_keys"):
            owner = np.repeat(np.arange(len(self.uid_list), dtype=np.int64), self.pos_lens)
            self._pos_keys = np.sort(owner * self.item_num + self.pos_items)
        return self._pos_keys
