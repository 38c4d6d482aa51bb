"""Independent PyTorch-CPU oracle for quality-parity checks — all 10 models.

recbole==1.0.1 (the reference's substrate) is NOT installable in this
environment — no package index is reachable and no recbole source exists on
disk (BASELINE.md:7-9 requires running it to generate baselines). Quality
parity is therefore established against this oracle: a generic torch trainer
(this file) driving the INDEPENDENT torch implementations of every model's
objective in tools/oracle_models.py (reference citations per model there),
under the reference's training protocol:

- recbole Trainer.fit semantics per phase: validate every ``eval_step``
  epochs, early-stop after ``stopping_step`` non-improving validations,
  snapshot the best parameters, final test on the last phase's best snapshot
  (SURVEY §1.6); DCDCSR skips validation during BOTH
  (`trainer/trainer.py:124-125`).
- ONE torch Adam across all phases (recbole builds the optimizer once in
  ``Trainer.__init__``, so moments persist across phases; since round 4 the
  framework's default ``phase_optimizer: single`` matches this — a
  torch-semantics Adam with per-leaf lazy step counts, trainer.SingleOptimizer;
  ``phase_optimizer: per_phase`` restores the old re-init behavior).
- xavier-normal init everywhere: the reference's zero-fills of out-of-domain
  table sections are clobbered by its own trailing
  ``apply(xavier_normal_initialization)`` (e.g. `conet.py:65-70` vs `:89`),
  so the EFFECTIVE reference init is plain xavier; the framework keeps real
  zero fills (those rows are dead for scoring — divergence documented).
- the oracle's own uniform rejection sampler (the reference's unbounded
  retry loop, `crossdomain_sampler.py:139-175`) over the same candidate
  sets; the SAME deterministic data pipeline and the SAME golden-tested
  evaluator as the framework (pipeline-level bugs are therefore invisible
  here — that threat is covered by the per-step loss/grad equivalence tests
  in tests/test_oracle_equivalence.py, which recompute forward+backward in
  torch from the reference equations on shared batches).

Usage: python -m tools.reference_oracle [MODEL ...]
Writes results/parity_oracle.md (+ per-run curves in results/parity_runs.json).
"""

import json
import sys
import time

import numpy as np
import torch

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.data.utils import data_preparation
from recbole_cdr_tpu.evaluator.evaluator import FullSortEvaluator
from recbole_cdr_tpu.quick_start import objective_function
from recbole_cdr_tpu.utils import get_model, init_seed
from recbole_cdr_tpu.utils.enums import InputType

from tools.oracle_models import ORACLES

SEEDS = (2022, 7, 99, 1234, 31337)

#: per-model training schedule (sized for the bundled example pair; the
#: framework runs the IDENTICAL schedule, so the comparison is apples-to-apples)
SCHEDULES = {
    "CMF": ["BOTH:60"],
    "CLFM": ["BOTH:60"],
    "CoNet": ["BOTH:40"],
    "DTCDR": ["BOTH:40"],
    "DeepAPF": ["BOTH:40"],
    "BiTGCF": ["BOTH:40"],
    "EMCDR": ["SOURCE:30", "TARGET:30", "OVERLAP:30"],
    # SSCDR converges slowly on the target domain: at 30 TARGET epochs both
    # sides are still climbing steeply and trajectory noise dominated the
    # round-3 comparison (fw +65% rel); at this schedule both converge and
    # the medians agree (investigated in parity_oracle.md "Investigations")
    "SSCDR": ["SOURCE:40", "TARGET:100", "OVERLAP:60"],
    "DCDCSR": ["SOURCE:30", "TARGET:30", "BOTH:15", "TARGET:30"],
    "NATR": ["SOURCE:30", "TARGET:30"],
}

METRICS = ["recall@10", "ndcg@10", "mrr@10", "hit@10", "precision@10"]
REL_TOL = 0.20   # medians within 20% relative ...
ABS_TOL = 0.02   # ... or 0.02 absolute (tiny-metric guard)


# ------------------------------------------------------------------- sampling

class _DomainSampler:
    """Uniform negative sampler with exact rejection (the reference's
    unbounded retry loop, `crossdomain_sampler.py:139-175`), over the
    sampler's candidate ids and per-user used sets."""

    def __init__(self, sampler, rng):
        self.cand = np.asarray(sampler.candidate_ids)
        used = sampler.used
        self.num_items = used.num_items
        self.used_keys = np.sort(used.keys)
        self.rng = rng

    def sample(self, uids):
        neg = self.cand[self.rng.integers(0, len(self.cand), len(uids))]
        while True:
            keys = uids.astype(np.int64) * self.num_items + neg
            loc = np.minimum(np.searchsorted(self.used_keys, keys),
                             max(len(self.used_keys) - 1, 0))
            bad = (self.used_keys[loc] == keys) if len(self.used_keys) else \
                np.zeros(len(keys), bool)
            if not bad.any():
                return neg
            neg[bad] = self.cand[self.rng.integers(0, len(self.cand), int(bad.sum()))]


def _domain_batches(batcher, sampler, rng, input_type, batch_size):
    """Framework-format batch dicts for one domain's epoch: pointwise
    [pos|neg] blocks with 0/1 labels (recbole TrainDataLoader layout) or
    pairwise rows with a ``neg_<iid>`` field. Weights all ones (full rows)."""
    table = batcher.table
    uids = np.asarray(table[table.uid_field])
    iids = np.asarray(table[table.iid_field])
    order = rng.permutation(len(uids))
    pointwise = input_type == InputType.POINTWISE
    step = batch_size // 2 if pointwise else batch_size
    for s in range(0, len(order), step):
        idx = order[s:s + step]
        u, i = uids[idx], iids[idx]
        neg = sampler.sample(u)
        if pointwise:
            yield {
                table.uid_field: np.concatenate([u, u]),
                table.iid_field: np.concatenate([i, neg]),
                table.label_field: np.concatenate(
                    [np.ones(len(u), np.float32), np.zeros(len(u), np.float32)]),
                batcher.weight_field: np.ones(2 * len(u), np.float32),
            }
        else:
            yield {
                table.uid_field: u,
                table.iid_field: i,
                batcher.neg_iid_field: neg,
                batcher.weight_field: np.ones(len(u), np.float32),
            }


def _phase_batches(phase, train_data, model, samplers, rng, input_type, bs):
    """One epoch of framework-format batches for ``phase`` (the reference's
    four dataloader states: BOTH zips target + cycling source)."""
    src_b, tgt_b = train_data.source_batcher, train_data.target_batcher
    if phase == "SOURCE":
        yield from _domain_batches(src_b, samplers["source"], rng, input_type, bs)
    elif phase == "TARGET":
        yield from _domain_batches(tgt_b, samplers["target"], rng, input_type, bs)
    elif phase == "OVERLAP":
        ids = np.asarray(train_data.overlap_batcher.overlap.ids)
        order = rng.permutation(len(ids))
        ov_bs = train_data.overlap_batcher.step
        for s in range(0, len(order), ov_bs):
            chunk = ids[order[s:s + ov_bs]]
            batch = {"overlap": chunk,
                     "overlap_sample_weight": np.ones(len(chunk), np.float32)}
            # SSCDR's semi-supervised neighbor draw (law verified equivalent
            # to the reference's per-row loop in tests/test_sampler.py)
            yield model.augment_batch(batch, "OVERLAP")
    else:  # BOTH
        src_iter = iter(_domain_batches(src_b, samplers["source"], rng, input_type, bs))
        for tgt_batch in _domain_batches(tgt_b, samplers["target"], rng, input_type, bs):
            try:
                src_batch = next(src_iter)
            except StopIteration:
                src_iter = iter(_domain_batches(src_b, samplers["source"], rng,
                                                input_type, bs))
                src_batch = next(src_iter)
            tgt_batch.update(src_batch)
            if model.__class__.__name__ == "DCDCSR":
                n_units = (model.target_num_users if model.mode == "overlap_users"
                           else model.target_num_items)
                tgt_batch["map_sample_idx"] = rng.integers(
                    0, n_units, model.map_batch_size).astype(np.int64)
            yield tgt_batch


# ----------------------------------------------------------------------- init

def _xavier_init(params, seed):
    """Torch-side init of the framework param layout with the reference's
    EFFECTIVE behavior: xavier normal on every >=2D weight, zeros on biases
    (recbole ``xavier_normal_initialization``); no zero-section fills (the
    reference's are clobbered by its own apply())."""
    import jax

    torch.manual_seed(seed)

    def init_one(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        a = np.asarray(leaf)
        t = torch.empty(a.shape, dtype=torch.float32)
        if not np.issubdtype(a.dtype, np.floating):
            return torch.tensor(a)
        if name == "b" or a.ndim < 2:
            torch.nn.init.zeros_(t)
        elif name in ("benchmark_embedding", "affine_embedding"):
            torch.nn.init.zeros_(t)
        else:
            torch.nn.init.xavier_normal_(t)
        t.requires_grad_(True)
        return t

    return jax.tree_util.tree_map_with_path(init_one, params)


# -------------------------------------------------------------------- scoring

def _score_fn(name, oracle, model, tp, phase, phase_count):
    """Per-phase torch full-sort scorer matching the reference's
    ``full_sort_predict`` routing."""
    n_ov_i, n_tgt_i = model.overlapped_num_items, model.target_num_items

    def compact_source_items(table):
        return torch.cat([table[:n_ov_i], table[n_tgt_i:]])

    if phase == "SOURCE":
        if name == "SSCDR":
            def fn(users):
                ue = oracle._norm(tp["source_user_embedding"][users])
                ie = oracle._norm(compact_source_items(tp["source_item_embedding"]))
                return -((ue[:, None, :] - ie[None, :, :]) ** 2).sum(-1)
        else:
            def fn(users):
                return tp["source_user_embedding"][users] @ \
                    compact_source_items(tp["source_item_embedding"]).T
        return fn
    if name == "EMCDR" and phase == "TARGET":
        return lambda users: tp["target_user_embedding"][users] @ \
            tp["target_item_embedding"][:n_tgt_i].T
    if name == "SSCDR" and phase == "TARGET":
        def fn(users):
            ue = oracle._norm(tp["target_user_embedding"][users])
            ie = oracle._norm(tp["target_item_embedding"][:n_tgt_i])
            return -((ue[:, None, :] - ie[None, :, :]) ** 2).sum(-1)
        return fn
    if name == "DCDCSR":
        return lambda users: oracle.full_sort(
            tp, model, users, phase=phase, phase_count=phase_count)
    return lambda users: oracle.full_sort(tp, model, users)


def _evaluate_torch(config, score_fn, eval_batches):
    """Score with a torch fn, rank/metric with the framework's (golden-tested)
    evaluator."""
    import jax.numpy as jnp

    evaluator = FullSortEvaluator(config)

    def jax_score(_params, users):
        with torch.no_grad():
            s = score_fn(torch.as_tensor(np.asarray(users), dtype=torch.long))
        return jnp.asarray(s.numpy())

    jax_score._no_jit = True  # torch inside — keep the evaluator's batch loop
    return evaluator.evaluate(jax_score, None, eval_batches)


# ------------------------------------------------------------ generic trainer

def train_oracle(name, seed, log=None, schedule=None, config_extra=None):
    """Full reference-protocol training of the torch oracle for ``name``.

    Returns the test-set metric dict (evaluated on the last phase's best
    parameter snapshot, like recbole's evaluate(load_best_model=True)).
    ``schedule``/``config_extra`` override the example-pair defaults (used by
    tools/oracle_scale.py for the Amazon-shaped head-to-head)."""
    import jax

    schedule = schedule or SCHEDULES[name]
    config = CDRConfig(
        model=name,
        config_dict={"state": "ERROR", "show_progress": False,
                     "train_batch_size": 512, "eval_batch_size": 8192,
                     "train_epochs": schedule, "seed": seed,
                     **(config_extra or {})},
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    train_data, valid_data, test_data = data_preparation(config, dataset)
    model = get_model(name)(config, dataset)
    oracle = ORACLES[name]()
    if name == "BiTGCF":
        oracle.prepare(dataset, model)

    rng = np.random.default_rng(seed)
    tp = _xavier_init(model.init_params(jax.random.PRNGKey(seed)), seed)
    leaves = [l for l in jax.tree_util.tree_leaves(tp)
              if isinstance(l, torch.Tensor) and l.is_floating_point()]
    frozen_buffers = {"benchmark_embedding", "affine_embedding"}
    # one optimizer across phases (recbole semantics); DCDCSR's derived
    # buffers are plain tensors in the reference, not parameters
    opt_params = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tp):
        top = path[0].key if hasattr(path[0], "key") else ""
        if isinstance(leaf, torch.Tensor) and leaf.is_floating_point() \
                and top not in frozen_buffers:
            opt_params.append(leaf)
        elif isinstance(leaf, torch.Tensor) and top in frozen_buffers:
            leaf.requires_grad_(False)
    opt = torch.optim.Adam(opt_params, lr=float(config["learning_rate"]))

    samplers = {
        "source": _DomainSampler(train_data.source_batcher.sampler, rng),
        "target": _DomainSampler(train_data.target_batcher.sampler, rng),
    }
    input_type = config["MODEL_INPUT_TYPE"]
    bs = config["train_batch_size"]
    valid_metric = (config["valid_metric"] or "MRR@10").lower()
    stopping_step = config["stopping_step"]
    eval_step = config["eval_step"] or 1

    if isinstance(valid_data, tuple):
        source_valid, target_valid = valid_data
    else:
        source_valid, target_valid = None, valid_data

    phase_counts = {"SOURCE": 0, "TARGET": 0, "BOTH": 0, "OVERLAP": 0}
    best_snapshot = None

    def snapshot():
        return [l.detach().clone() for l in leaves]

    def restore(s):
        with torch.no_grad():
            for l, b in zip(leaves, s):
                l.copy_(b)

    for entry in schedule:
        phase, epochs = entry.split(":")
        epochs = int(epochs)
        phase_counts[phase] += 1
        count = phase_counts[phase]
        model.set_phase(phase)

        # reference phase-entry parameter surgery (torch-side, detached)
        if name == "DCDCSR" and phase == "BOTH" and model.mode != "non_overlap":
            with torch.no_grad():
                tp["benchmark_embedding"] = oracle.build_benchmark(tp, model)
        if name == "DCDCSR" and phase == "TARGET" and count == 2:
            tp["affine_embedding"] = oracle.build_affine(tp, model)
        if name == "NATR" and phase == "TARGET":
            tp["source_user_embedding"].requires_grad_(False)
            tp["source_item_embedding"].requires_grad_(False)

        # validation routing (DCDCSR: none during BOTH)
        phase_valid = source_valid if (phase == "SOURCE" and source_valid is not None) \
            else target_valid
        if name == "DCDCSR" and phase == "BOTH":
            phase_valid = None

        best_score, cur_step = -np.inf, 0
        for epoch in range(epochs):
            for batch in _phase_batches(phase, train_data, model, samplers,
                                        rng, input_type, bs):
                opt.zero_grad()
                kwargs = {"phase_count": count} if name == "DCDCSR" else {}
                oracle.loss(tp, batch, model, phase, **kwargs).backward()
                opt.step()
            if phase_valid is not None and (epoch + 1) % eval_step == 0:
                fn = _score_fn(name, oracle, model, tp, phase, count)
                vres = _evaluate_torch(config, fn, phase_valid)
                vscore = vres[valid_metric]
                if log is not None:
                    log.append({"model": name, "seed": seed, "phase": entry,
                                "epoch": epoch, "valid": vres})
                if vscore > best_score:
                    best_score, cur_step = vscore, 0
                    best_snapshot = snapshot()
                else:
                    cur_step += 1
                    if stopping_step is not None and cur_step > stopping_step:
                        break
        if phase_valid is None:
            best_snapshot = snapshot()

    if best_snapshot is not None:
        restore(best_snapshot)
    # final scoring state: the reference evaluates with phase-final routing
    final_phase = schedule[-1].split(":")[0]
    fn = _score_fn(name, oracle, model, tp,
                   "OVERLAP" if name in ("EMCDR", "SSCDR") else final_phase,
                   phase_counts[final_phase])
    return _evaluate_torch(config, fn, test_data)


def framework_run(model, train_epochs, seed):
    import tempfile

    # saved=True -> recbole protocol: evaluate the BEST validation checkpoint
    r = objective_function(config_dict={
        "model": model, "state": "ERROR", "show_progress": False,
        "train_batch_size": 512, "eval_batch_size": 8192,
        "train_epochs": train_epochs, "seed": seed,
        "checkpoint_dir": tempfile.mkdtemp(prefix="oracle_ckpt_"),
    }, saved=True)
    return r["test_result"]


# --------------------------------------------------------------------- runner

def main():
    # CPU-pin: the oracle comparison is a CPU job (tiny pair, torch CPU) and
    # must never contend for the single TPU (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")
    names = sys.argv[1:] or list(SCHEDULES)
    rows = []
    curves = []
    for name in names:
        t0 = time.time()
        oracle_res = [train_oracle(name, seed=s, log=curves) for s in SEEDS]
        fw_res = [framework_run(name, SCHEDULES[name], s) for s in SEEDS]
        rows.append((name, oracle_res, fw_res, time.time() - t0))
        for s, r in zip(SEEDS, oracle_res):
            print(f"{name} oracle    seed={s}:", r, flush=True)
        for s, r in zip(SEEDS, fw_res):
            print(f"{name} framework seed={s}:", r, flush=True)

    # partial re-runs (argv names) MERGE with the stored results so the
    # report keeps covering all models (the full 10-model sweep is ~hours
    # of torch-CPU; per-model refreshes must not clobber it)
    try:
        with open("results/parity_runs.json") as f:
            prior = json.load(f)
    except (OSError, ValueError):
        prior = {"curves": [], "final": []}
    ran = {n for n, *_ in rows}
    for row in prior.get("final", []):
        if row["model"] not in ran and row["model"] in SCHEDULES:
            rows.append((row["model"], row["oracle"], row["framework"],
                         row.get("wall_s", 0.0)))
    rows.sort(key=lambda r: list(SCHEDULES).index(r[0]))
    curves = [c for c in prior.get("curves", []) if c.get("model") not in ran] + curves

    with open("results/parity_runs.json", "w") as f:
        json.dump({"curves": curves,
                   "final": [{"model": n,
                              "oracle": o, "framework": fw, "wall_s": round(dt, 1)}
                             for n, o, fw, dt in rows]}, f, indent=1)

    lines = [
        "# Quality parity vs a torch oracle of the reference semantics",
        "",
        "recbole==1.0.1 cannot run in this environment (no package index, no",
        "vendored source — see BASELINE.md), so parity is measured against an",
        "independent PyTorch implementation of every model's objective",
        "(`tools/oracle_models.py`, reference file:line citations inline)",
        "driven by a generic torch trainer (`tools/reference_oracle.py`) under",
        "the reference's protocol: same deterministic data pipeline, same",
        "golden-tested evaluator, validate/early-stop/evaluate-best, one Adam",
        "across phases.",
        "",
        "**Per-step equivalence is a committed, green test suite** —",
        "`tests/test_oracle_equivalence.py` runs one framework batch through",
        "the JAX loss and the torch oracle for every model and phase and",
        "asserts loss AND full-gradient agreement to f32 tolerance, compares",
        "DCDCSR's benchmark/affine parameter surgery tensor-for-tensor, and",
        "checks that a full epoch of Adam from identical init lands on",
        "matching parameters. The residual end-to-end differences below are",
        "therefore sampling/init/protocol noise, bounded by the criterion:",
        f"medians across {len(SEEDS)} seeds within {int(REL_TOL*100)}% relative",
        f"(or {ABS_TOL} absolute) of each other.",
        "",
        "Known protocol differences (both directions documented):",
        "- (closed in round 4) optimizer-across-phases: the framework's",
        "  default `phase_optimizer: single` now matches recbole's ONE",
        "  optimizer (torch-semantics Adam, per-leaf lazy step counts);",
        "  `per_phase` remains available;",
        "- the reference's zero-fills of out-of-domain table sections are dead",
        "  code (clobbered by its trailing `apply(xavier_normal_initialization)`,",
        "  e.g. `conet.py:65-70` vs `:89`) — the oracle implements the effective",
        "  xavier-everywhere init, the framework keeps real zero fills;",
        "- seeds control init + sampling draws, not shared randomness.",
        "",
        f"Bundled example pair, ratio 8:1:1 split, full-sort, topk [10], seeds {list(SEEDS)}.",
        "",
    ]
    verdict_ok = True
    for name, oracle_res, fw_res, dt in rows:
        lines.append(f"## {name}  (schedule {SCHEDULES[name]})")
        lines.append("")
        lines.append("| metric | oracle median (min..max) | framework median (min..max) | rel diff | within tol |")
        lines.append("|---|---|---|---|---|")
        collapses = []
        for m in METRICS:
            ov = np.array([r[m] for r in oracle_res])
            fv = np.array([r[m] for r in fw_res])
            om, fm = float(np.median(ov)), float(np.median(fv))
            rel = abs(fm - om) / max(om, 1e-9)
            ok = rel <= REL_TOL or abs(fm - om) <= ABS_TOL
            verdict_ok &= ok
            for side, vals, med in (("oracle", ov, om), ("framework", fv, fm)):
                low = vals < 0.5 * med
                if med > 0.05 and low.any():
                    collapses.append(
                        f"{side} {m}: seeds {list(np.array(SEEDS)[low])} at "
                        f"{np.round(vals[low], 4).tolist()} vs median {med:.4f}")
            lines.append(
                f"| {m} | {om:.4f} ({ov.min():.4f}..{ov.max():.4f}) "
                f"| {fm:.4f} ({fv.min():.4f}..{fv.max():.4f}) "
                f"| {rel*100:.1f}% | {'yes' if ok else 'NO'} |"
            )
        lines.append("")
        if collapses:
            lines.append("Collapsed runs (seed <50% of its column median): " +
                         "; ".join(collapses))
            lines.append("")
        lines.append(f"Wall: {dt:.0f}s (oracle {len(SEEDS)} seeds + framework {len(SEEDS)} seeds)")
        lines.append("")
    lines += [
        "## Investigations (round 3)",
        "",
        "Every flagged anomaly was traced to a mechanism (curves in",
        "`results/parity_runs.json`); none is a semantic divergence:",
        "",
        "- **Oracle seed collapses (CMF seed 2022, EMCDR seed 7)** are the",
        "  REFERENCE PROTOCOL itself: with `eval_step 1, stopping_step 10`,",
        "  an unlucky first-epoch validation peak followed by the usual",
        "  warmup dip accumulates 11 non-improvements and early-stops the",
        "  phase at near-init quality (CMF 2022: valid mrr 0.039 at epoch 0,",
        "  never re-crossed before the stop at epoch 11; the same seed's",
        "  neighbors climb past it from epoch ~12). The framework run, with",
        "  different draws, misses the dip. This also explains round 2's",
        "  0.05..0.50 CMF oracle band. Medians absorb it.",
        "- **SSCDR's round-3 systematic gap (+65% rel at 30-epoch phases)**",
        "  was schedule truncation, not semantics: scoring is bit-identical",
        "  (transplanting the framework's trained params into the torch",
        "  scorer reproduces its metrics to 4 decimals), valid curves track",
        "  closely, and at a converged schedule (SOURCE:40, TARGET:100,",
        "  OVERLAP:60) the medians agree (mrr 0.279 oracle vs 0.294",
        "  framework, seeds interleaved). Per-phase Adam re-init was tested",
        "  and ruled out as the driver.",
        "",
        "**Verdict: framework medians within tolerance of the oracle for "
        f"every metric of every model: {'YES' if verdict_ok else 'NO'}.**",
    ]
    out = "results/parity_oracle.md"
    # preserve the Amazon-shaped scale section appended by tools/oracle_scale.py
    scale_tail = ""
    try:
        with open(out) as f:
            old = f.read()
        marker = "\n## Reference-scale head-to-head"
        if marker in old:
            scale_tail = "\n" + old[old.index(marker):]
    except OSError:
        pass
    with open(out, "w") as f:
        f.write("\n".join(lines) + scale_tail)
    print("wrote", out, "verdict_ok:", verdict_ok)


if __name__ == "__main__":
    main()
