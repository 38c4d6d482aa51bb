"""Link-file handling: source tokens translated to target tokens before the
joint remap (reference `recbole_cdr/data/dataset.py:320-323,447-543`)."""

import os

import numpy as np
import pytest

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.utils import init_seed


def write_pair(root):
    """Two domains with disjoint raw user tokens, linked via a .link file."""
    src = os.path.join(root, "src")
    tgt = os.path.join(root, "tgt")
    os.makedirs(src)
    os.makedirs(tgt)
    rng = np.random.default_rng(0)
    with open(os.path.join(src, "src.inter"), "w") as f:
        f.write("user_id:token\titem_id:token\trating:float\n")
        for u in range(1, 13):
            for i in rng.choice(30, size=8, replace=False):
                f.write(f"su{u}\tsi{i}\t{rng.integers(3, 6)}\n")
    # target domain names its user field differently (per-domain
    # USER_ID_FIELD), which is what lets a link file carry both columns
    with open(os.path.join(tgt, "tgt.inter"), "w") as f:
        f.write("target_user_id:token\titem_id:token\trating:float\n")
        for u in range(1, 11):
            for i in rng.choice(25, size=8, replace=False):
                f.write(f"tu{u}\tti{i}\t{rng.integers(3, 6)}\n")
    # link the first 6 source users to target users
    link = os.path.join(root, "u.link")
    with open(link, "w") as f:
        f.write("user_id:token\ttarget_user_id:token\n")
        for u in range(1, 7):
            f.write(f"su{u}\ttu{u}\n")
    return link


def test_user_link_creates_overlap(tmp_path):
    link = write_pair(str(tmp_path))
    config = CDRConfig(
        model="CMF",
        config_dict={
            "source_dataset": "src",
            "target_dataset": "tgt",
            "source_data_path": str(tmp_path),
            "target_data_path": str(tmp_path),
            "user_link_file_path": link,
            "target_USER_ID_FIELD": "target_user_id",
            "target_load_col": {"inter": ["target_user_id", "item_id", "rating"]},
            "source_user_inter_num_interval": "[1,inf)",
            "source_item_inter_num_interval": "[1,inf)",
            "target_user_inter_num_interval": "[1,inf)",
            "target_item_inter_num_interval": "[1,inf)",
            "source_val_interval": None,
            "target_val_interval": None,
        },
        _cli_args=[],
    )
    init_seed(42, True)
    ds = CrossDomainDataset(config)
    # raw tokens are disjoint, so without the link there would be 1 (PAD only);
    # the link merges 6 user identities
    assert ds.num_overlap_user == 7
    assert ds.num_overlap_item == 1
    # linked users share one unified ID: source rows for su1..su6 landed on
    # ids in the overlap prefix [1, 7)
    src = ds.source_domain_dataset
    src_uids = src.arrays[src.uid_field]
    assert (src_uids < 7).any()
    # and the overlap dataset covers the overlapped users
    assert len(ds.overlap_dataset) == 7


def test_missing_link_file_raises(tmp_path):
    write_pair(str(tmp_path))
    config = CDRConfig(
        model="CMF",
        config_dict={
            "source_dataset": "src",
            "target_dataset": "tgt",
            "source_data_path": str(tmp_path),
            "target_data_path": str(tmp_path),
            "user_link_file_path": str(tmp_path / "nope.link"),
            "target_USER_ID_FIELD": "target_user_id",
            "target_load_col": {"inter": ["target_user_id", "item_id", "rating"]},
            "source_user_inter_num_interval": "[1,inf)",
            "source_item_inter_num_interval": "[1,inf)",
            "target_user_inter_num_interval": "[1,inf)",
            "target_item_inter_num_interval": "[1,inf)",
            "source_val_interval": None,
            "target_val_interval": None,
        },
        _cli_args=[],
    )
    with pytest.raises(ValueError):
        CrossDomainDataset(config)
