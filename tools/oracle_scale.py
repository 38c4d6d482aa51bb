"""Oracle head-to-head at the reference's Amazon shape (VERDICT r3 #2).

Runs the torch oracle trainer (tools/reference_oracle.py) and the framework
on the SAME Amazon-shaped synthetic pair (tools/bench_scale.py: 135k/115k/4M
source -> 27k/18.5k/763k target, 5,982 overlapped users — matching
`/root/reference/results/Amazon.md:60-68`), same schedules, same seeds, and
appends the comparison to results/parity_oracle.md.

Scale knobs (honest notes, also written into the report):
- epochs are reduced (the oracle is torch on a 2-CPU host; the reference's
  500-epoch schedules are days of CPU) — both sides run the IDENTICAL
  reduced schedule, so the comparison is apples-to-apples at that budget;
- BiTGCF runs n_layers=1 and batch 32768 on BOTH sides (the oracle's
  per-step full-graph torch-sparse propagation at 4.8M nnz dominates
  otherwise).

Process layout (learned the hard way): each (side, model) runs in its OWN
subprocess — the framework side opens a fresh TPU claim per model and exits;
the oracle side pins JAX to CPU before any backend init. A single process
that used the chip, went CPU-only for a ~20-min torch phase, then dispatched
eval work again WEDGED in the tunnel (main thread in futex wait, zero CPU —
the CLAUDE.md hang signature). Usage: python -m tools.oracle_scale
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

from tools import bench_scale
from tools.reference_oracle import ABS_TOL, METRICS, REL_TOL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = bench_scale.BENCH_DIR

SEEDS = (2022, 7, 99)

#: (schedule, extra-config) per model — identical on both sides
RUNS = {
    "CMF": (["BOTH:8"], {}),
    "EMCDR": (["SOURCE:4", "TARGET:4", "OVERLAP:8"], {}),
    "BiTGCF": (["BOTH:2"], {"n_layers": 1, "train_batch_size": 32768}),
}

_NO_FILTER = {
    "val_interval": None,
    "user_inter_num_interval": "[1,inf)",
    "item_inter_num_interval": "[1,inf)",
}


def _scale_config(extra):
    cfg = {
        "train_batch_size": 8192,
        "eval_batch_size": 4096000,
        "source_dataset": "amzn-src", "target_dataset": "amzn-tgt",
        "source_data_path": BENCH_DIR, "target_data_path": BENCH_DIR,
        **{f"source_{k}": v for k, v in _NO_FILTER.items()},
        **{f"target_{k}": v for k, v in _NO_FILTER.items()},
    }
    cfg.update(extra)
    return cfg


def framework_run(model, schedule, seed, extra):
    from recbole_cdr_tpu.quick_start import objective_function

    r = objective_function(config_dict={
        "model": model, "state": "ERROR", "show_progress": False,
        "train_epochs": schedule, "seed": seed,
        "checkpoint_dir": tempfile.mkdtemp(prefix="oracle_scale_ckpt_"),
        **_scale_config(extra),
    }, saved=True)
    return r["test_result"]


def _worker(side, name):
    """Subprocess body: run all seeds of one (side, model), print one JSON
    sentinel line. The oracle side pins CPU BEFORE any jax backend init."""
    schedule, extra = RUNS[name]
    if side == "oracle":
        import jax

        jax.config.update("jax_platforms", "cpu")
        from tools.reference_oracle import train_oracle

        res = []
        for s in SEEDS:
            res.append(train_oracle(name, seed=s, schedule=schedule,
                                    config_extra=_scale_config(extra)))
            print(f"{name} oracle    seed={s}: {res[-1]}", flush=True)
    else:
        res = []
        for s in SEEDS:
            res.append(framework_run(name, schedule, s, extra))
            print(f"{name} framework seed={s}: {res[-1]}", flush=True)
    print("WORKER_RESULT " + json.dumps(res), flush=True)


def _run_worker(side, name):
    """Launch a worker subprocess from the repo root, parse its sentinel."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-u", "-m", "tools.oracle_scale",
         f"--{side}-worker", name],
        capture_output=True, text=True, cwd=REPO, timeout=3 * 3600,
    )
    sys.stdout.write(proc.stdout[-4000:] if len(proc.stdout) > 4000 else proc.stdout)
    sys.stdout.flush()
    for line in proc.stdout.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line[len("WORKER_RESULT "):]), time.time() - t0
    raise RuntimeError(
        f"{side} worker for {name} failed (rc={proc.returncode}):\n"
        + proc.stderr[-3000:]
    )


def main():
    if "--oracle-worker" in sys.argv:
        return _worker("oracle", sys.argv[sys.argv.index("--oracle-worker") + 1])
    if "--fw-worker" in sys.argv:
        return _worker("fw", sys.argv[sys.argv.index("--fw-worker") + 1])
    bench_scale.gen_amazon_scale()
    # resume: models already completed in a prior run are reused
    partial_path = os.path.join(BENCH_DIR, "oracle_scale_partial.json")
    done = {}
    if os.path.exists(partial_path):
        with open(partial_path) as f:
            done = {r["model"]: r for r in json.load(f)}
    rows = []
    for name, (schedule, extra) in RUNS.items():
        if name in done:
            r = done[name]
            rows.append((name, r["schedule"], r["extra"], r["oracle"],
                         r["framework"], r["oracle_s"], r["framework_s"]))
            print(f"{name}: reusing completed prior run", flush=True)
            continue
        fw, fw_dt = _run_worker("fw", name)
        oc, oc_dt = _run_worker("oracle", name)
        rows.append((name, schedule, extra, oc, fw, oc_dt, fw_dt))
        with open(partial_path, "w") as f:
            json.dump([{"model": n, "schedule": sc, "extra": ex, "oracle": o,
                        "framework": fv, "oracle_s": od, "framework_s": fd}
                       for n, sc, ex, o, fv, od, fd in rows], f, indent=1)

    # ---- report ---------------------------------------------------------
    lines = [
        "",
        "## Reference-scale head-to-head (Amazon-shaped pair, round 4)",
        "",
        "Same protocol as above, on the Amazon-shaped synthetic twin",
        "(`tools/bench_scale.py`: 135,109/115,172/4,042,382 source ->",
        "26,968/18,563/762,957 target, 5,982 overlapped users — the shape of",
        "`/root/reference/results/Amazon.md:60-68`; real pair not",
        f"downloadable here). Seeds {list(SEEDS)}; epochs reduced to a",
        "CPU-feasible budget for the torch oracle — IDENTICAL schedule on",
        "both sides. BiTGCF runs n_layers=1 / batch 32768 on both sides (the",
        "oracle's per-step full-graph torch-sparse propagation dominates",
        "otherwise). Produced by `python -m tools.oracle_scale`.",
        "",
    ]
    ok_all = True
    for name, schedule, extra, oc, fw, oc_dt, fw_dt in rows:
        lines.append(f"### {name}  (schedule {schedule}"
                     + (f", extra {extra}" if extra else "") + ")")
        lines.append("")
        lines.append("| metric | oracle median (min..max) | framework median (min..max) | rel diff | within tol |")
        lines.append("|---|---|---|---|---|")
        for m in METRICS:
            ov = np.array([r[m] for r in oc])
            fv = np.array([r[m] for r in fw])
            om, fm = float(np.median(ov)), float(np.median(fv))
            rel = abs(fm - om) / max(om, 1e-9)
            ok = rel <= REL_TOL or abs(fm - om) <= ABS_TOL
            ok_all &= ok
            lines.append(
                f"| {m} | {om:.4f} ({ov.min():.4f}..{ov.max():.4f}) "
                f"| {fm:.4f} ({fv.min():.4f}..{fv.max():.4f}) "
                f"| {rel * 100:.1f}% | {'yes' if ok else 'NO'} |"
            )
        lines.append("")
        lines.append(f"Wall: oracle {oc_dt / 60:.1f} min (torch, 2 CPUs), "
                     f"framework {fw_dt / 60:.1f} min (TPU, incl. compile + "
                     f"data build).")
        lines.append("")
    lines.append(
        f"**Scale verdict: {'YES' if ok_all else 'NO'}** — medians within "
        f"{int(REL_TOL * 100)}% relative (or {ABS_TOL} absolute) at the "
        "Amazon shape."
    )
    path = os.path.join(REPO, "results", "parity_oracle.md")
    try:
        with open(path) as f:
            old = f.read()
    except OSError:
        old = ""
    # replace (not append) any prior scale section so reruns don't accumulate
    marker = "\n## Reference-scale head-to-head"
    if marker in old:
        old = old[: old.index(marker)]
    with open(path, "w") as f:
        f.write(old + "\n".join(lines) + "\n")
    print(json.dumps({
        "ok": ok_all,
        "rows": [
            {"model": n, "oracle_med": {m: float(np.median([r[m] for r in oc])) for m in METRICS},
             "framework_med": {m: float(np.median([r[m] for r in fw])) for m in METRICS}}
            for n, _, _, oc, fw, _, _ in rows
        ],
    }))


if __name__ == "__main__":
    main()
