"""Fine-grained ablation: is the device-loop rejection cost the hist gather,
the compare scan, or the candidate draws? Run on the real chip."""

import jax
import jax.numpy as jnp

from recbole_cdr_tpu.trainer import device_loop as dl
from recbole_cdr_tpu.trainer.trainer import build_optimizer
from tools.profile_device_loop import build, time_loop


def main():
    config, model, train_data = build()
    loss_fn = model.loss_fn("BOTH")
    tx = build_optimizer(config, lambda n: True)

    real = dl._sample_negatives

    time_loop("full step", loss_fn, tx, train_data, config, model)

    def no_gather(rng, uids, user_hist, candidate_ids, neg_num, rounds=None):
        # broadcast row 0 instead of gathering per-uid rows
        def fake_hist(idx):
            return jnp.broadcast_to(user_hist[0], (idx.shape[0], user_hist.shape[1]))

        class V:
            shape = user_hist.shape
            dtype = user_hist.dtype

            def __getitem__(self, idx):
                return fake_hist(idx)

        return real(rng, uids, V(), candidate_ids, neg_num, rounds)

    def gather_no_compare(rng, uids, user_hist, candidate_ids, neg_num, rounds=None):
        total = uids.shape[0] * neg_num
        hist = user_hist[jnp.tile(uids, neg_num)]
        draw = candidate_ids[jax.random.randint(rng, (total,), 0, candidate_ids.shape[0])]
        # force the gather to materialize without the compare scan
        return draw + (jnp.sum(hist, dtype=jnp.int32) * 0).astype(draw.dtype)

    def one_round(rng, uids, user_hist, candidate_ids, neg_num, rounds=None):
        return real(rng, uids, user_hist, candidate_ids, neg_num, rounds=1)

    # try/finally so a failed time_loop can't leave the module monkeypatched
    # for the rest of the process (ADVICE r1)
    try:
        dl._sample_negatives = no_gather
        time_loop("gather -> broadcast row0", loss_fn, tx, train_data, config, model)

        dl._sample_negatives = gather_no_compare
        time_loop("gather, no compare scan", loss_fn, tx, train_data, config, model)

        dl._sample_negatives = one_round
        time_loop("R=1 (gather + 1-round compare)", loss_fn, tx, train_data, config, model)
    finally:
        dl._sample_negatives = real


if __name__ == "__main__":
    main()
