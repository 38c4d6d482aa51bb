"""Benchmark: CMF training throughput (examples/s/chip) on a synthetic large
cross-domain pair, end-to-end through the real pipeline (config -> dataset ->
sampler -> batcher -> jitted train step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against a minimal PyTorch-CPU implementation of the
same CMF step (the reference stack is torch on CPU in its CI,
`.github/workflows/python-package.yml:22-41`; it publishes no throughput
numbers — BASELINE.md).
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(REPO, ".bench_data")

N_SRC_USERS, N_SRC_ITEMS, N_SRC_INTER = 30000, 8000, 600000
N_TGT_USERS, N_TGT_ITEMS, N_TGT_INTER = 12000, 5000, 250000
N_SHARED_ITEMS = 2000
BATCH = 8192
MEASURE_STEPS = 200
WARMUP_STEPS = 20


def gen_bench_data():
    """Synthesize a zipf-ish large pair as atomic TSV files (cached)."""
    os.makedirs(BENCH_DIR, exist_ok=True)
    marker = os.path.join(BENCH_DIR, ".done_v1")
    if os.path.exists(marker):
        return
    rng = np.random.default_rng(7)

    def gen(name, prefix, n_users, n_items, n_inter, item_tokens):
        uids = rng.zipf(1.3, n_inter * 2) % n_users + 1
        iids = rng.zipf(1.2, n_inter * 2) % n_items
        keep = np.unique(np.stack([uids, iids]), axis=1)[:, :n_inter]
        uids, iids = keep[0], keep[1]
        # cap per-user degree at 5% of the item space: real datasets are
        # sparse; an uncapped zipf head user otherwise covers ~all items
        cap = max(50, n_items // 20)
        order = np.argsort(uids, kind="stable")
        uids, iids = uids[order], iids[order]
        starts = np.searchsorted(uids, np.arange(uids.max() + 2))
        pos_in_user = np.arange(len(uids)) - starts[uids]
        sel = pos_in_user < cap
        uids, iids = uids[sel], iids[sel]
        d = os.path.join(BENCH_DIR, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{name}.inter"), "w") as f:
            f.write("user_id:token\titem_id:token\trating:float\n")
            ratings = rng.integers(1, 6, len(uids))
            for u, i, r in zip(uids, iids, ratings):
                f.write(f"{prefix}_{u}\t{item_tokens[i]}\t{r}\n")

    shared = [f"item_{i}" for i in range(N_SHARED_ITEMS)]
    src_items = shared + [f"src_item_{i}" for i in range(N_SRC_ITEMS - N_SHARED_ITEMS)]
    tgt_items = shared + [f"tgt_item_{i}" for i in range(N_TGT_ITEMS - N_SHARED_ITEMS)]
    gen("bench-src", "su", N_SRC_USERS, N_SRC_ITEMS, N_SRC_INTER, src_items)
    gen("bench-tgt", "tu", N_TGT_USERS, N_TGT_ITEMS, N_TGT_INTER, tgt_items)
    open(marker, "w").write("ok")


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from recbole_cdr_tpu.config import CDRConfig
    from recbole_cdr_tpu.data.dataset import CrossDomainDataset
    from recbole_cdr_tpu.data.utils import data_preparation
    from recbole_cdr_tpu.utils import get_model, init_seed
    from recbole_cdr_tpu.trainer.trainer import build_optimizer

    config = CDRConfig(
        model="CMF",
        config_dict={
            "state": "ERROR",
            "show_progress": False,
            "train_batch_size": BATCH,
            "eval_batch_size": 65536,
            "train_epochs": ["BOTH:1"],
            "source_dataset": "bench-src",
            "target_dataset": "bench-tgt",
            "source_data_path": BENCH_DIR,
            "target_data_path": BENCH_DIR,
            "source_user_inter_num_interval": "[1,inf)",
            "source_item_inter_num_interval": "[1,inf)",
            "target_user_inter_num_interval": "[1,inf)",
            "target_item_inter_num_interval": "[1,inf)",
            "source_val_interval": None,
            "target_val_interval": None,
            "checkpoint_dir": os.path.join(BENCH_DIR, "saved"),
        },
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    train_data, _, _ = data_preparation(config, dataset)
    model = get_model("CMF")(config, dataset)

    from recbole_cdr_tpu.trainer.device_loop import DeviceEpochLoop
    from recbole_cdr_tpu.utils.enums import TrainMode

    params = model.init_params(jax.random.PRNGKey(0))
    loss_fn = model.loss_fn("BOTH")
    tx = build_optimizer(config, lambda n: True)

    # the product hot path: device-resident epoch loop (sampling + batch
    # assembly + every optimizer step inside one jitted scan per epoch)
    loop = DeviceEpochLoop(
        TrainMode.BOTH, loss_fn, tx, train_data,
        config["MODEL_INPUT_TYPE"], neg_num=1,
        num_users=model.total_num_users, base_rng=jax.random.PRNGKey(1),
    )
    opt_state = tx.init(params)
    neg = 1
    examples_per_step = (
        loop.step * (1 + neg) + loop.src_step * (1 + neg)
    )

    # warmup/compile
    params, opt_state, loss = loop.run_epoch(params, opt_state, 0)
    loss.block_until_ready()

    n_epochs = max(1, MEASURE_STEPS // loop.steps_per_epoch)
    # epochs between validation points fuse into one device dispatch
    # (trainer chunks by eval_step the same way); compile it before timing
    params, opt_state, losses = loop.run_epochs(params, opt_state, 1, n_epochs)
    losses.block_until_ready()
    t0 = time.perf_counter()
    params, opt_state, losses = loop.run_epochs(
        params, opt_state, 1 + n_epochs, n_epochs
    )
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    n_chips = max(1, len(jax.devices()))
    return examples_per_step * loop.steps_per_epoch * n_epochs / dt / n_chips


def bench_torch_cpu(total_users, total_items, steps=15):
    """Minimal torch-CPU CMF step (embedding gather + BCE + Adam), the
    reference's compute pattern on its CI hardware."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    D = 64
    user_emb = torch.nn.Embedding(total_users, D)
    item_emb = torch.nn.Embedding(total_items, D)
    opt = torch.optim.Adam(list(user_emb.parameters()) + list(item_emb.parameters()), lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    B = BATCH

    def step():
        su = torch.randint(0, total_users, (B,))
        si = torch.randint(0, total_items, (B,))
        tu = torch.randint(0, total_users, (B,))
        ti = torch.randint(0, total_items, (B,))
        label = (torch.arange(B) < B // 2).float()
        opt.zero_grad()
        p_s = (user_emb(su) * item_emb(si)).sum(-1)
        p_t = (user_emb(tu) * item_emb(ti)).sum(-1)
        loss = 0.5 * loss_fn(p_s, label) + 0.5 * loss_fn(p_t, label)
        loss.backward()
        opt.step()

    step()  # warmup
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    # median step time: robust to CPU-contention spikes on the shared host
    med = sorted(times)[len(times) // 2]
    return 2 * B / med


def main():
    gen_bench_data()
    tpu_eps = bench_tpu()
    try:
        torch_eps = bench_torch_cpu(N_SRC_USERS + N_TGT_USERS, N_SRC_ITEMS + N_TGT_ITEMS)
    except Exception:
        torch_eps = None
    vs = round(tpu_eps / torch_eps, 3) if torch_eps else 1.0
    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip",
                "value": round(tpu_eps, 1),
                "unit": "examples/s/chip",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
