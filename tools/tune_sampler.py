"""Sweep rejection-sampler tiling parameters on the real chip."""

import time

import jax

import bench
from recbole_cdr_tpu.trainer import device_loop as dl
from recbole_cdr_tpu.trainer.trainer import build_optimizer
from recbole_cdr_tpu.utils.enums import TrainMode
from tools.profile_device_loop import build


def time_variant(tag, config, model, train_data, tx, loss_fn, n_epochs=5):
    loop = dl.DeviceEpochLoop(
        TrainMode.BOTH, loss_fn, tx, train_data,
        config["MODEL_INPUT_TYPE"], neg_num=1,
        num_users=model.total_num_users, base_rng=jax.random.PRNGKey(1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    params, opt_state, losses = loop.run_epochs(params, opt_state, 0, n_epochs)
    losses.block_until_ready()
    t0 = time.perf_counter()
    params, opt_state, losses = loop.run_epochs(params, opt_state, n_epochs, n_epochs)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    per_step = dt / (n_epochs * loop.steps_per_epoch) * 1e3
    print(f"{tag:28s} {per_step:8.3f} ms/step")


def main():
    config, model, train_data = build()
    loss_fn = model.loss_fn("BOTH")
    tx = build_optimizer(config, lambda n: True)

    for chunk in (32, 128, 256):
        for rounds in (16, 8):
            dl._HIST_CHUNK = chunk
            dl.R_ROUNDS = rounds
            time_variant(f"chunk={chunk} R={rounds}", config, model, train_data, tx, loss_fn)


if __name__ == "__main__":
    main()
