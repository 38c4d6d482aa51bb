"""Train every model on the bundled structured pair and record test metrics.

Produces results/example_pair.md — the framework's quality snapshot on a
dataset pair whose generating process has real preference structure
(tools/gen_example_data.py), with random-ranking baselines for context.

Run: python tools/run_quality_sweep.py   (uses the TPU if available)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recbole_cdr_tpu.quick_start import objective_function

SCHEDULES = {
    "CMF": ["BOTH:40"],
    "CLFM": ["BOTH:40"],
    "CoNet": ["BOTH:40"],
    "DTCDR": ["BOTH:40"],
    "DeepAPF": ["BOTH:40"],
    "BiTGCF": ["BOTH:40"],
    "EMCDR": ["SOURCE:30", "TARGET:30", "OVERLAP:30"],
    "SSCDR": ["SOURCE:30", "TARGET:30", "OVERLAP:30"],
    "DCDCSR": ["SOURCE:30", "TARGET:30", "BOTH:15", "TARGET:30"],
    "NATR": ["SOURCE:30", "TARGET:30"],
}


def main():
    import jax
    import jax.numpy as jnp

    # device/backend init is paid once, not by whichever model runs first
    t0 = time.time()
    jnp.zeros(8).block_until_ready()
    setup_s = time.time() - t0
    print(f"device setup: {setup_s:.0f}s on {jax.devices()[0].platform}", flush=True)

    rows = []
    for model, schedule in SCHEDULES.items():
        t0 = time.time()
        try:
            r = objective_function(
                config_dict={
                    "model": model,
                    "state": "ERROR",
                    "show_progress": False,
                    "train_batch_size": 512,
                    "eval_batch_size": 4096,
                    "train_epochs": schedule,
                    "learning_rate": 0.005,
                    "stopping_step": 10,
                },
                saved=False,
            )
            res = r["test_result"]
            rows.append((model, res, time.time() - t0))
            print(f"{model}: {res} ({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{model}: FAILED {type(e).__name__}: {e}", flush=True)
            rows.append((model, None, time.time() - t0))

    out = os.path.join(os.path.dirname(__file__), "..", "results", "example_pair.md")
    with open(out, "w") as f:
        f.write("# Quality snapshot — bundled ml-1m -> ml-100k style pair\n\n")
        f.write("Structured synthetic pair (latent-factor generating process, "
                "item overlap 120/200+180 items; see tools/gen_example_data.py). "
                "Random-ranking reference: recall@10 ~= 0.056, hit@10 ~= 0.30, "
                "ndcg@10 ~= 0.03 on ~180 target items.\n\n")
        f.write(f"(device/backend setup paid once before the sweep: {setup_s:.0f}s; "
                "per-model wall includes that model's own XLA compiles)\n\n")
        f.write("| Model | Recall@10 | MRR@10 | NDCG@10 | Hit@10 | Precision@10 | train s |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for model, res, dt in rows:
            if res is None:
                f.write(f"| {model} | FAILED | | | | | {dt:.0f} |\n")
            else:
                f.write(
                    f"| {model} | {res['recall@10']:.4f} | {res['mrr@10']:.4f} | "
                    f"{res['ndcg@10']:.4f} | {res['hit@10']:.4f} | "
                    f"{res['precision@10']:.4f} | {dt:.0f} |\n"
                )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
