"""Component-level timing of the device epoch loop at bench scale.

Times the full epoch program, then ablated variants (no rejection sampling /
no optimizer update / sampling only) to attribute per-step cost. Run on the
real chip: ``python -m tools.profile_device_loop``.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench
from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.data.utils import data_preparation
from recbole_cdr_tpu.trainer import device_loop as dl
from recbole_cdr_tpu.trainer.trainer import build_optimizer
from recbole_cdr_tpu.utils import get_model, init_seed
from recbole_cdr_tpu.utils.enums import TrainMode


def build():
    bench.gen_bench_data()
    config = CDRConfig(
        model="CMF",
        config_dict={
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": bench.BATCH,
            "eval_batch_size": 65536,
            "train_epochs": ["BOTH:1"],
            "source_dataset": "bench-src",
            "target_dataset": "bench-tgt",
            "source_data_path": bench.BENCH_DIR,
            "target_data_path": bench.BENCH_DIR,
            "source_user_inter_num_interval": "[1,inf)",
            "source_item_inter_num_interval": "[1,inf)",
            "target_user_inter_num_interval": "[1,inf)",
            "target_item_inter_num_interval": "[1,inf)",
            "source_val_interval": None,
            "target_val_interval": None,
            "checkpoint_dir": bench.BENCH_DIR + "/saved",
        },
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    train_data, _, _ = data_preparation(config, dataset)
    model = get_model("CMF")(config, dataset)
    return config, model, train_data


def time_loop(tag, loss_fn, tx, train_data, config, model, n_epochs=5):
    loop = dl.DeviceEpochLoop(
        TrainMode.BOTH, loss_fn, tx, train_data,
        config["MODEL_INPUT_TYPE"], neg_num=1,
        num_users=model.total_num_users, base_rng=jax.random.PRNGKey(1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    params, opt_state, losses = loop.run_epochs(params, opt_state, 0, n_epochs)
    jax.tree_util.tree_leaves(losses)[0].block_until_ready()
    t0 = time.perf_counter()
    params, opt_state, losses = loop.run_epochs(params, opt_state, n_epochs, n_epochs)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    per_step = dt / (n_epochs * loop.steps_per_epoch)
    print(f"{tag:30s} {per_step * 1e3:8.3f} ms/step   ({loop.steps_per_epoch} steps/epoch)")
    return per_step


def main():
    config, model, train_data = build()
    loss_fn = model.loss_fn("BOTH")
    tx = build_optimizer(config, lambda n: True)

    full = time_loop("full step", loss_fn, tx, train_data, config, model)

    # ablation: negatives = raw uniform draws, no rejection/hist compare
    real_sample = dl._sample_negatives

    def no_reject(rng, uids, user_hist, candidate_ids, neg_num):
        total = uids.shape[0] * neg_num
        return candidate_ids[
            jax.random.randint(rng, (total,), 0, candidate_ids.shape[0])
        ]

    dl._sample_negatives = no_reject
    no_rej = time_loop("no rejection sampling", loss_fn, tx, train_data, config, model)
    dl._sample_negatives = real_sample

    # ablation: sgd instead of adam (isolates moment traffic over the tables)
    sgd = optax.sgd(1e-3)
    sgd_t = time_loop("sgd optimizer", loss_fn, sgd, train_data, config, model)

    # ablation: loss = plain sum of a few gathered rows (no model math)
    def tiny_loss(p, batch, rng):
        acc = 0.0
        for k, v in batch.items():
            if v.dtype in (jnp.int32, jnp.int64):
                acc = acc + jnp.sum(p["user_embedding"][v % p["user_embedding"].shape[0]])
        return acc * 0.0 + 1.0

    samp_only = time_loop("sampling+assembly only", tiny_loss, sgd, train_data, config, model)

    print()
    print(f"rejection cost   : {(full - no_rej) * 1e3:7.3f} ms/step")
    print(f"adam-vs-sgd cost : {(full - sgd_t) * 1e3:7.3f} ms/step")
    print(f"model math+grads : {(sgd_t - samp_only) * 1e3:7.3f} ms/step (approx)")


if __name__ == "__main__":
    main()
