"""Temporal-ordering (TO) split support."""

import os

import numpy as np

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.utils import init_seed


def write_pair(root):
    rng = np.random.default_rng(3)
    for name, prefix, n_users in (("to-src", "s", 12), ("to-tgt", "t", 10)):
        d = os.path.join(root, name)
        os.makedirs(d)
        with open(os.path.join(d, f"{name}.inter"), "w") as f:
            f.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
            t = 0
            for u in range(1, n_users + 1):
                for i in rng.choice(30, size=10, replace=False):
                    t += 1
                    f.write(f"{prefix}u{u}\titem{i}\t{rng.integers(3, 6)}\t{t}\n")


def test_temporal_ordering_split(tmp_path):
    write_pair(str(tmp_path))
    config = CDRConfig(
        model="CMF",
        config_dict={
            "source_dataset": "to-src",
            "target_dataset": "to-tgt",
            "source_data_path": str(tmp_path),
            "target_data_path": str(tmp_path),
            "source_load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
            "target_load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
            "source_user_inter_num_interval": "[1,inf)",
            "source_item_inter_num_interval": "[1,inf)",
            "target_user_inter_num_interval": "[1,inf)",
            "target_item_inter_num_interval": "[1,inf)",
            "source_val_interval": None,
            "target_val_interval": None,
            "eval_args": {
                "split": {"RS": [0.8, 0.1, 0.1]},
                "group_by": "user",
                "order": "TO",
                "mode": "full",
            },
        },
        _cli_args=[],
    )
    init_seed(7, True)
    ds = CrossDomainDataset(config)
    src_train, src_valid, tgt_train, tgt_valid, tgt_test = ds.build()
    # temporal split: every user's train timestamps precede their test ones
    tgt = ds.target_domain_dataset
    ts_field = "target_timestamp"
    assert ts_field in tgt.inter_feat.columns
    ts = tgt.inter_feat[ts_field].to_numpy()
    uid_tr = tgt_train["target_user_id"]
    # rebuild per-row timestamps via a uid+iid key lookup
    key_all = (
        tgt.arrays["target_user_id"].astype(np.int64) * 10_000
        + tgt.arrays["target_item_id"]
    )
    key2ts = dict(zip(key_all.tolist(), ts.tolist()))

    def times(table):
        keys = table["target_user_id"].astype(np.int64) * 10_000 + table["target_item_id"]
        return np.array([key2ts[k] for k in keys.tolist()])

    tr_t, te_t = times(tgt_train), times(tgt_test)
    for u in np.unique(uid_tr):
        tr_u = tr_t[tgt_train["target_user_id"] == u]
        te_u = te_t[tgt_test["target_user_id"] == u]
        if len(te_u):
            assert tr_u.max() <= te_u.min()
