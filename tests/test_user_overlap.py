"""Exercise the overlap_users code paths (the bundled pair overlaps on items):
shared raw user tokens across domains, disjoint items."""

import os

import numpy as np
import pytest

from recbole_cdr_tpu.quick_start import objective_function


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("user_overlap_pair"))
    rng = np.random.default_rng(7)
    K = 4
    n_shared_users = 40
    user_f = {f"u{u}": rng.normal(0, 1, K) for u in range(1, 81)}

    def gen(name, users, items, n_per_user):
        item_f = {it: rng.normal(0, 1, K) for it in items}
        d = os.path.join(root, name)
        os.makedirs(d)
        with open(os.path.join(d, f"{name}.inter"), "w") as f:
            f.write("user_id:token\titem_id:token\trating:float\n")
            for u in users:
                aff = np.array([item_f[it] @ user_f[u] for it in items])
                p = np.exp(aff - aff.max())
                p /= p.sum()
                chosen = rng.choice(len(items), size=n_per_user, replace=False, p=p)
                for c in chosen:
                    r = int(np.clip(np.round(3 + aff[c] + rng.normal(0, 1)), 1, 5))
                    f.write(f"{u}\t{items[c]}\t{r}\n")

    # users u1..u40 shared; source also has u41..u60, target u61..u80
    src_users = [f"u{u}" for u in range(1, 61)]
    tgt_users = [f"u{u}" for u in list(range(1, 41)) + list(range(61, 81))]
    src_items = [f"s_item{i}" for i in range(60)]
    tgt_items = [f"t_item{i}" for i in range(50)]
    gen("uo-src", src_users, src_items, 12)
    gen("uo-tgt", tgt_users, tgt_items, 10)
    return root


def run_user_overlap(pair_root, model, train_epochs):
    r = objective_function(
        config_dict={
            "model": model,
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": 256,
            "eval_batch_size": 2048,
            "train_epochs": train_epochs,
            "source_dataset": "uo-src",
            "target_dataset": "uo-tgt",
            "source_data_path": pair_root,
            "target_data_path": pair_root,
            "source_user_inter_num_interval": "[2,inf)",
            "source_item_inter_num_interval": "[2,inf)",
            "target_user_inter_num_interval": "[2,inf)",
            "target_item_inter_num_interval": "[2,inf)",
            "source_val_interval": None,
            "target_val_interval": None,
        },
        saved=False,
    )
    res = r["test_result"]
    assert 0.0 <= res["recall@10"] <= 1.0
    return res


def test_emcdr_user_overlap(pair_root):
    run_user_overlap(pair_root, "EMCDR", ["SOURCE:1", "TARGET:1", "OVERLAP:1"])


def test_sscdr_user_overlap(pair_root):
    run_user_overlap(pair_root, "SSCDR", ["SOURCE:1", "TARGET:1", "OVERLAP:1"])


def test_conet_user_overlap(pair_root):
    run_user_overlap(pair_root, "CoNet", ["BOTH:1"])


def test_deepapf_user_overlap(pair_root):
    run_user_overlap(pair_root, "DeepAPF", ["BOTH:1"])


def test_dcdcsr_user_overlap(pair_root):
    run_user_overlap(pair_root, "DCDCSR", ["SOURCE:1", "TARGET:1", "BOTH:1", "TARGET:1"])


def test_natr_user_overlap(pair_root):
    run_user_overlap(pair_root, "NATR", ["SOURCE:1", "TARGET:1"])


def test_cmf_user_overlap(pair_root):
    run_user_overlap(pair_root, "CMF", ["BOTH:1"])


def test_clfm_user_overlap(pair_root):
    run_user_overlap(pair_root, "CLFM", ["BOTH:1"])


def test_dtcdr_user_overlap(pair_root):
    run_user_overlap(pair_root, "DTCDR", ["BOTH:1"])


def test_bitgcf_user_overlap(pair_root):
    run_user_overlap(pair_root, "BiTGCF", ["BOTH:1"])


def test_emcdr_user_overlap_oracle_equivalence(pair_root):
    """Per-step loss+grad+full-sort equivalence vs the torch oracle in
    overlap_users mode — the branch the bundled (item-overlap) pair never
    exercises (found while investigating the Amazon-scale EMCDR gap, r4)."""
    import jax
    import jax.numpy as jnp

    from recbole_cdr_tpu.config import CDRConfig
    from recbole_cdr_tpu.data.dataset import CrossDomainDataset
    from recbole_cdr_tpu.data.utils import data_preparation
    from recbole_cdr_tpu.utils import get_model, init_seed
    from tools.oracle_models import ORACLES
    from tests.test_oracle_equivalence import _check_phase, _check_full_sort

    config = CDRConfig(
        model="EMCDR",
        config_dict={
            "state": "ERROR", "show_progress": False,
            "train_batch_size": 256, "eval_batch_size": 2048,
            "train_epochs": ["SOURCE:1", "TARGET:1", "OVERLAP:1"],
            "source_dataset": "uo-src", "target_dataset": "uo-tgt",
            "source_data_path": pair_root, "target_data_path": pair_root,
            "source_user_inter_num_interval": "[2,inf)",
            "source_item_inter_num_interval": "[2,inf)",
            "target_user_inter_num_interval": "[2,inf)",
            "target_item_inter_num_interval": "[2,inf)",
            "source_val_interval": None, "target_val_interval": None,
        },
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    train_data, _, _ = data_preparation(config, dataset)
    model = get_model("EMCDR")(config, dataset)
    assert model.mode == "overlap_users"
    params = model.init_params(jax.random.PRNGKey(7))
    oracle = ORACLES["EMCDR"]()
    for phase in ("SOURCE", "TARGET", "OVERLAP"):
        model.set_phase(phase)
        _check_phase(model, params, oracle, train_data, phase)
    _check_full_sort(model, params, oracle, phase="OVERLAP")
