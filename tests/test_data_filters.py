"""Filter-option parity: rm_dup_inter, normalization, threshold labels, TO ordering."""

import os

import numpy as np
import pytest

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset, DomainDataset
from recbole_cdr_tpu.utils import init_seed


def write_simple(root, name, rows, header="user_id:token\titem_id:token\trating:float\ttimestamp:float"):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{name}.inter"), "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def make_domain_config(tmp_path, name, **extra):
    base = {
        "dataset": name,
        "data_path": os.path.join(str(tmp_path), name),
        "field_separator": "\t",
        "encoding": "utf-8",
        "USER_ID_FIELD": "user_id",
        "ITEM_ID_FIELD": "item_id",
        "RATING_FIELD": "rating",
        "TIME_FIELD": "timestamp",
        "NEG_PREFIX": "neg_",
        "LABEL_FIELD": "label",
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "user_inter_num_interval": None,
        "item_inter_num_interval": None,
        "val_interval": None,
        "drop_filter_field": True,
        "rm_dup_inter": None,
        "normalize_field": None,
        "normalize_all": False,
        "threshold": None,
        "seq_len": None,
        "benchmark_filename": None,
    }
    base.update(extra)

    class Cfg(dict):
        def __getitem__(self, k):
            return self.get(k)

    return Cfg(base)


def test_rm_dup_inter_first_and_last(tmp_path):
    rows = [
        ("u1", "i1", 2, 100),
        ("u1", "i1", 5, 200),
        ("u1", "i2", 3, 150),
    ]
    write_simple(str(tmp_path), "dup", rows)
    d_first = DomainDataset(make_domain_config(tmp_path, "dup", rm_dup_inter="first"), "source")
    assert len(d_first.inter_feat) == 2
    assert d_first.inter_feat["rating"].tolist()[0] == 2.0  # earlier kept

    d_last = DomainDataset(make_domain_config(tmp_path, "dup", rm_dup_inter="last"), "source")
    kept = d_last.inter_feat[d_last.inter_feat["item_id"] == "i1"]["rating"].tolist()
    assert kept == [5.0]


def test_normalize_all(tmp_path):
    rows = [("u1", "i1", 1, 100), ("u2", "i2", 3, 200), ("u3", "i3", 5, 300)]
    write_simple(str(tmp_path), "norm", rows)
    d = DomainDataset(make_domain_config(tmp_path, "norm", normalize_all=True), "source")
    d.remap_to_ids({"u1": 1, "u2": 2, "u3": 3, "[PAD]": 0},
                   {"i1": 1, "i2": 2, "i3": 3, "[PAD]": 0},
                   ["[PAD]", "u1", "u2", "u3"], ["[PAD]", "i1", "i2", "i3"])
    d.finalize()
    ratings = sorted(d.inter_feat["source_rating"].tolist())
    np.testing.assert_allclose(ratings, [0.0, 0.5, 1.0])


def test_threshold_labels(tmp_path):
    rows = [("u1", "i1", 1, 100), ("u2", "i2", 3, 200), ("u3", "i3", 5, 300)]
    write_simple(str(tmp_path), "thr", rows)
    d = DomainDataset(make_domain_config(tmp_path, "thr", threshold={"rating": 3}), "source")
    d.remap_to_ids({"u1": 1, "u2": 2, "u3": 3, "[PAD]": 0},
                   {"i1": 1, "i2": 2, "i3": 3, "[PAD]": 0},
                   ["[PAD]", "u1", "u2", "u3"], ["[PAD]", "i1", "i2", "i3"])
    d.finalize()
    assert sorted(d.arrays["source_label"].tolist()) == [0.0, 1.0, 1.0]
