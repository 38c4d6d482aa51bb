"""Phase-scheduled trainer: the four-mode schedule over jitted train steps.

Capability parity with ``CrossDomainTrainer`` / ``DCDCSRTrainer``
(`recbole_cdr/trainer/trainer.py:19-137`) plus the inherited recbole
``Trainer`` epoch loop (per-epoch loss, validation every ``eval_step`` epochs,
early stop after ``stopping_step`` non-improving validations, best-checkpoint
save, final evaluate on the best checkpoint).

TPU-first redesign:
- one jitted, buffer-donating train step per (phase, optimizer) pair; batches
  have static shapes so each phase compiles exactly once
- per-phase parameter freezing via ``optax.multi_transform`` masks (instead of
  torch's requires_grad toggling)
- losses accumulate as device scalars and only sync at epoch end
"""

import os
import pickle
import time
from datetime import datetime, timezone
from functools import partial
from logging import getLogger

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recbole_cdr_tpu.evaluator.evaluator import FullSortEvaluator, ValueEvaluator
from recbole_cdr_tpu.utils import ensure_dir, set_color
from recbole_cdr_tpu.utils.enums import TrainMode, train_mode2state
from recbole_cdr_tpu.utils.precision import resolve_compute_dtype, with_compute_dtype


def build_optimizer(config, trainable_pred, param_names=None):
    """optax chain mirroring recbole's learner/learning_rate/weight_decay/
    clip_grad_norm settings, with per-phase freezing (masking only added when
    some parameter is actually frozen — it costs extra full-table passes)."""
    learner = (config["learner"] or "adam").lower()
    lr = config["learning_rate"]
    weight_decay = config["weight_decay"] or 0.0

    if learner in ("adam", "sparse_adam"):
        opt = optax.adam(lr)
    elif learner == "sgd":
        opt = optax.sgd(lr)
    elif learner == "adagrad":
        opt = optax.adagrad(lr)
    elif learner == "rmsprop":
        opt = optax.rmsprop(lr)
    else:
        opt = optax.adam(lr)

    chain = []
    clip = config["clip_grad_norm"]
    if clip:
        chain.append(optax.clip_by_global_norm(float(clip.get("max_norm", 5.0))))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(opt)
    tx = optax.chain(*chain)

    if param_names is not None and all(trainable_pred(k) for k in param_names):
        return tx

    def label_fn(params):
        return {k: ("train" if trainable_pred(k) else "freeze") for k in params}

    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, label_fn)


class SingleOptimizer:
    """ONE optimizer state shared across training phases — recbole
    ``Trainer.__init__`` semantics (the reference builds its torch optimizer
    once and reuses it for every phase, `recbole_cdr/trainer/trainer.py:43-76`
    via the inherited ``Trainer``): a parameter frozen in one phase keeps its
    Adam moments and resumes them when a later phase unfreezes it.

    torch.optim.Adam state is PER-PARAMETER and lazily initialized — a
    parameter's ``step`` count only advances on steps where it has a grad.
    optax.adam cannot express that (one global count, and
    ``optax.multi_transform`` changes the state STRUCTURE per phase), so this
    implements the torch update rule directly: state is
    ``{"mu": tree, "nu": tree, "count": per-leaf int32}`` — structure
    independent of the phase, so one state threads through every phase's
    jitted train step (and through checkpoint/resume) unchanged.

    ``for_phase(trainable_pred)`` returns an optax-style
    ``GradientTransformation`` closing over that phase's freeze mask: frozen
    leaves get update 0 and their state passes through untouched."""

    def __init__(self, config):
        self.learner = (config["learner"] or "adam").lower()
        if self.learner not in ("adam", "sgd"):
            # 'sparse_adam' is routed to trainer.SparseAdam by the trainer
            # (the true torch.optim.SparseAdam semantics), not silently
            # approximated by dense Adam here (ADVICE r4)
            raise ValueError(
                f"phase_optimizer: 'single' supports adam/sgd, got "
                f"'{self.learner}' — use phase_optimizer: 'per_phase'"
            )
        self.lr = float(config["learning_rate"])
        self.wd = float(config["weight_decay"] or 0.0)
        clip = config["clip_grad_norm"]
        self.clip = float(clip.get("max_norm", 5.0)) if clip else None
        self.b1, self.b2, self.eps = 0.9, 0.999, 1e-8

    @staticmethod
    def _tmap(fn, *trees):
        return jax.tree_util.tree_map(fn, *trees)

    def init(self, params):
        # params values may be nested subtrees (MLP towers); freezing and the
        # torch per-param step count operate per TOP-LEVEL entry (the same
        # granularity as trainable_predicate / multi_transform labels)
        if self.learner == "sgd":
            return optax.EmptyState()
        return {
            "mu": self._tmap(jnp.zeros_like, params),
            "nu": self._tmap(jnp.zeros_like, params),
            "count": {k: jnp.zeros((), jnp.int32) for k in params},
        }

    def ensure(self, params, state):
        """Carry ``state`` into a phase whose param tree may have gained or
        lost entries (DCDCSR's phase surgery adds derived tables): keep
        matching subtrees, zero-init new ones."""
        if state is None:
            return self.init(params)
        if self.learner == "sgd":
            return state
        fresh = self.init(params)

        def _compatible(old, new):
            try:
                self._tmap(
                    lambda a, b: (_ for _ in ()).throw(ValueError())
                    if a.shape != b.shape else a,
                    old, new,
                )
                return True
            except ValueError:
                return False

        for k in fresh["mu"]:
            if k in state["mu"] and _compatible(state["mu"][k], fresh["mu"][k]):
                fresh["mu"][k] = state["mu"][k]
                fresh["nu"][k] = state["nu"][k]
                fresh["count"][k] = state["count"][k]
        return fresh

    def for_phase(self, trainable_pred, param_names):
        mask = {k: bool(trainable_pred(k)) for k in param_names}

        def update(grads, state, params=None):
            g = dict(grads)
            # torch order: clip_grad_norm_ acts on the RAW grads of the
            # parameters that have grads, THEN the optimizer adds its L2
            # weight-decay term (recbole clips before optimizer.step)
            if self.clip is not None:
                sq = sum(
                    jnp.sum(jnp.square(leaf))
                    for k, v in g.items() if mask.get(k, True)
                    for leaf in jax.tree_util.tree_leaves(v)
                )
                scale = jnp.minimum(1.0, self.clip / (jnp.sqrt(sq) + 1e-6))
                g = {
                    k: self._tmap(lambda x: x * scale, v) if mask.get(k, True) else v
                    for k, v in g.items()
                }
            if self.wd:
                g = {
                    k: self._tmap(lambda gg, pp: gg + self.wd * pp, v, params[k])
                    if mask.get(k, True) else v
                    for k, v in g.items()
                }
            if self.learner == "sgd":
                updates = {
                    k: self._tmap(
                        (lambda x: -self.lr * x)
                        if mask.get(k, True) else jnp.zeros_like,
                        v,
                    )
                    for k, v in g.items()
                }
                return updates, state
            new_state = {"mu": {}, "nu": {}, "count": {}}
            updates = {}
            for k, gk in g.items():
                if not mask.get(k, True):
                    updates[k] = self._tmap(jnp.zeros_like, gk)
                    new_state["mu"][k] = state["mu"][k]
                    new_state["nu"][k] = state["nu"][k]
                    new_state["count"][k] = state["count"][k]
                    continue
                c = state["count"][k] + 1
                mu = self._tmap(
                    lambda m, x: self.b1 * m + (1.0 - self.b1) * x,
                    state["mu"][k], gk,
                )
                nu = self._tmap(
                    lambda n, x: self.b2 * n + (1.0 - self.b2) * jnp.square(x),
                    state["nu"][k], gk,
                )
                bc1 = 1.0 - self.b1 ** c.astype(jnp.float32)
                bc2 = 1.0 - self.b2 ** c.astype(jnp.float32)
                updates[k] = self._tmap(
                    lambda m, n: (
                        -self.lr * (m / bc1.astype(m.dtype))
                        / (jnp.sqrt(n / bc2.astype(n.dtype)) + self.eps)
                    ),
                    mu, nu,
                )
                new_state["mu"][k] = mu
                new_state["nu"][k] = nu
                new_state["count"][k] = c
            return updates, new_state

        return optax.GradientTransformation(self.init, update)


class SparseAdam(SingleOptimizer):
    """torch.optim.SparseAdam semantics for embedding tables, with the same
    cross-phase shared ``{"mu", "nu", "count"}`` state tree as
    :class:`SingleOptimizer` (checkpointing and phase threading unchanged).

    torch.optim.SparseAdam (torch/optim/_functional.py ``sparse_adam``):

    - the per-PARAM ``step`` count ticks once per optimizer step;
    - only the rows present in the step's (coalesced) sparse grad update
      their exp_avg/exp_avg_sq and receive a parameter update — untouched
      rows keep stale moments ("lazy");
    - ``denom = sqrt(nu_row) + eps`` with both bias corrections folded into
      the step size ``lr * sqrt(1 - b2^step) / (1 - b1^step)`` (NOT the
      dense-Adam form, where eps is added after ``sqrt(nu / bc2)``);
    - weight_decay is rejected and there is no grad clipping.

    The device epoch loop consumes :meth:`row_update` for tables declared in
    the model's ``sparse_spec`` — gradients there are taken wrt the GATHERED
    rows, so the dense [N, D] grad table never materializes in HBM (the
    dense-Adam step is HBM-bound on exactly that traffic,
    results/step_breakdown.md roofline) — and the inherited dense torch-Adam
    update for everything else (the reference's torch.optim.SparseAdam
    *errors* on dense grads; recbole's CDR models produce only dense grads,
    so ``learner: sparse_adam`` is unusable upstream — this is a strict
    superset, documented in PARITY.md). Phases without a spec fall back to
    the inherited dense update wholesale.
    """

    def __init__(self, config):
        learner = (config["learner"] or "adam").lower()
        if learner not in ("adam", "sparse_adam"):
            raise ValueError(
                f"phase_optimizer: 'sparse' supports adam/sparse_adam, got "
                f"'{learner}'"
            )
        if float(config["weight_decay"] or 0.0) != 0.0:
            raise ValueError(
                "phase_optimizer: 'sparse' rejects weight_decay (as "
                "torch.optim.SparseAdam does)"
            )
        if config["clip_grad_norm"]:
            raise ValueError(
                "phase_optimizer: 'sparse' does not support clip_grad_norm "
                "(clipping needs the global grad norm, which defeats the "
                "row-sparse update)"
            )
        self.learner = "adam"
        self.lr = float(config["learning_rate"])
        self.wd = 0.0
        self.clip = None
        self.b1, self.b2, self.eps = 0.9, 0.999, 1e-8

    def row_update(self, p, mu, nu, g_rows, ids, c):
        """One SparseAdam step for one table: ``g_rows[j]`` is the grad of
        row ``ids[j]`` (duplicates allowed — they are coalesced by summation,
        exactly like torch's sparse-tensor ``coalesce()`` before the update).

        Shapes: p/mu/nu [N, D], g_rows [R, D], ids [R] int32, c = the leaf's
        post-increment step count (traced scalar). Returns (p, mu, nu).

        Coalescing is SORT-FREE (raced on the real chip at the Amazon user
        table, R=32k: the argsort+segment chain cost 20.3 ms/step vs 2.6 ms
        for this form): a [N]-int scatter-min records each row's first
        occurrence position, every occurrence scatter-adds its grad into
        that slot of a compact [R, D] accumulator, and only first-occurrence
        ("head") slots update/scatter — duplicates coalesce by summation
        exactly like torch's sparse ``coalesce()``.
        """
        N = p.shape[0]
        R = ids.shape[0]
        pos = jnp.arange(R, dtype=jnp.int32)
        firstpos = jnp.full((N,), R, jnp.int32).at[ids].min(pos)
        fp = jnp.take(firstpos, ids)                        # [R]
        head = fp == pos
        gc = jnp.zeros((R, p.shape[1]), mu.dtype).at[fp].add(
            g_rows.astype(mu.dtype)
        )
        safe = jnp.where(head, ids, 0)
        mu_r = self.b1 * jnp.take(mu, safe, axis=0) + (1.0 - self.b1) * gc
        nu_r = self.b2 * jnp.take(nu, safe, axis=0) + (1.0 - self.b2) * gc * gc
        cf = c.astype(jnp.float32)
        bc1 = 1.0 - self.b1 ** cf
        bc2 = 1.0 - self.b2 ** cf
        step_size = self.lr * jnp.sqrt(bc2) / bc1
        upd = (-step_size.astype(p.dtype)) * mu_r / (jnp.sqrt(nu_r) + self.eps)
        tgt = jnp.where(head, ids, N)                       # non-head -> drop
        p = p.at[tgt].add(upd, mode="drop")
        mu = mu.at[tgt].set(mu_r, mode="drop")
        nu = nu.at[tgt].set(nu_r, mode="drop")
        return p, mu, nu

    def dense_entry_update(self, g_entry, mu_entry, nu_entry, c):
        """torch dense-Adam step for one (possibly nested) non-table entry:
        returns (update, mu, nu). Used by the sparse device-loop body for
        the leaves outside the model's sparse_spec."""
        cf = c.astype(jnp.float32)
        bc1 = 1.0 - self.b1 ** cf
        bc2 = 1.0 - self.b2 ** cf
        mu2 = self._tmap(
            lambda m, g: self.b1 * m + (1.0 - self.b1) * g, mu_entry, g_entry
        )
        nu2 = self._tmap(
            lambda n, g: self.b2 * n + (1.0 - self.b2) * jnp.square(g),
            nu_entry, g_entry,
        )
        upd = self._tmap(
            lambda m, n: (
                -self.lr * (m / bc1.astype(m.dtype))
                / (jnp.sqrt(n / bc2.astype(n.dtype)) + self.eps)
            ),
            mu2, nu2,
        )
        return upd, mu2, nu2


def make_predict_full_sort(model, phase, item_num, chunk=4096,
                           compute_dtype=jnp.float32):
    """Blocked full-sort fallback for models without a native full-sort path:
    scores (user, item) pairs via ``predict_fn`` over item chunks (the analogue
    of recbole's repeated-predict fallback, SURVEY §3.3).

    The whole item axis runs as ONE jitted ``lax.scan`` over item tiles —
    a single device dispatch per user batch. The previous per-chunk host loop
    issued ~item_num/chunk dispatches per batch, which over the TPU tunnel
    dominated eval wall time at large item spaces (VERDICT r2 weak #4).

    The per-tile (user, item) PAIR count is bounded, not the item count:
    predict-path models can expand each pair by a large factor (NATR gathers
    a [pairs, max_inter_length, D] history — at Amazon scale an unbounded
    1024-user x 4096-item tile allocated 53 GB and OOM'd the chip)."""
    #: max (user, item) pairs materialized per scan tile; NATR's 50-row f32
    #: history expansion costs pairs * 12.8 KB -> ~3.4 GB peak at this bound
    PAIR_BUDGET = 1 << 18
    predict = with_compute_dtype(model.predict_fn(), compute_dtype)
    uid_key = model.TARGET_USER_ID
    iid_key = model.TARGET_ITEM_ID
    max_chunk = chunk

    @jax.jit
    def full_sort(params, users):
        B = users.shape[0]
        chunk = min(max_chunk, max(128, PAIR_BUDGET // max(B, 1)),
                    max(128, 1 << (item_num - 1).bit_length()))
        n_chunks = (item_num + chunk - 1) // chunk
        rep_users = jnp.repeat(users, chunk)

        def body(_, item_start):
            # clamp the tail tile onto the last item; sliced off below
            items = jnp.minimum(item_start + jnp.arange(chunk), item_num - 1)
            batch = {uid_key: rep_users, iid_key: jnp.tile(items, B)}
            return None, predict(params, batch).reshape(B, chunk)

        starts = jnp.arange(n_chunks) * chunk
        _, tiles = jax.lax.scan(body, None, starts)      # [n_chunks, B, chunk]
        scores = jnp.moveaxis(tiles, 0, 1).reshape(B, n_chunks * chunk)
        return scores[:, :item_num]

    # per-score-element cost here is a full predict() (NATR: a 50-row
    # attention per pair, ~6400 flops/element vs ~128 for a D=64 matmul) —
    # the evaluator must budget its dispatches by PAIRS, not elements, or a
    # segment sized for matmul scoring runs minutes and trips the TPU
    # worker watchdog (observed at the Amazon shape)
    full_sort._pair_cost = True
    return full_sort


class CrossDomainTrainer:
    """Iterates ``train_modes``; per phase resets early-stopping state, flips
    the dataloader mode + model phase, and runs the epoch loop."""

    def __init__(self, config, model):
        self.config = config
        self.model = model
        self.logger = getLogger()

        self.train_modes = config["train_modes"]
        self.train_epochs = config["epoch_num"]
        self.split_valid_flag = config["source_split"]

        self.valid_metric = (config["valid_metric"] or "MRR@10").lower()
        self.valid_metric_bigger = config["valid_metric_bigger"]
        self.stopping_step = config["stopping_step"]
        self.loss_decimal_place = config["loss_decimal_place"] or 4

        self.evaluator = FullSortEvaluator(config)
        self.value_evaluator = ValueEvaluator(config)

        # mixed precision: f32 master params, compute in config dtype
        # (utils/precision.py); buffer donation is on unless disabled
        self.compute_dtype = resolve_compute_dtype(config)
        self.donate = config["donate_params"] is not False

        ensure_dir(config["checkpoint_dir"])
        # multi-host: every process must derive the IDENTICAL file name (the
        # orbax save is a collective over one path). Wall-clock stamps differ
        # across hosts, so the coordinator's timestamp is broadcast — a fixed
        # name would make concurrent runs sharing a checkpoint_dir silently
        # overwrite each other
        if jax.process_count() == 1:
            stamp = datetime.now().strftime("%b-%d-%Y_%H-%M-%S")
        else:
            from jax.experimental import multihost_utils

            t = float(multihost_utils.broadcast_one_to_all(
                np.float64(time.time())
            ))
            # UTC render: hosts may sit in different timezones; a tz-local
            # format would re-diverge the names the broadcast just unified
            stamp = datetime.fromtimestamp(t, tz=timezone.utc).strftime(
                "%b-%d-%Y_%H-%M-%S"
            )
        saved_model_file = "{}-{}.pth".format(config["model"], stamp)
        self.saved_model_file = os.path.join(config["checkpoint_dir"], saved_model_file)

        seed = config["seed"] or 2022
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_key = jax.random.split(self.rng)
        self.params = model.init_params(init_key)  # property: bumps params_version

        # SPMD: with a mesh_shape config, tables are vocab-sharded over
        # 'model' and batches over 'data'; XLA inserts the collectives
        self.mesh = None
        self._batch_sharding = None
        if config["mesh_shape"]:
            from recbole_cdr_tpu.parallel import make_mesh
            from recbole_cdr_tpu.parallel.mesh import (
                batch_sharding,
                pad_tables_for_sharding,
                shard_params,
            )

            self.mesh = make_mesh(config["mesh_shape"])
            self.params = shard_params(
                pad_tables_for_sharding(self.params, self.mesh), self.mesh
            )
            self._batch_sharding = batch_sharding(self.mesh)
            self.logger.info(f"training over mesh {dict(self.mesh.shape)}")

        self.best_valid_score = None
        self.best_valid_result = None
        self.best_params = None
        self.train_loss_dict = {}
        self._compiled = {}
        self._score_fns = {}
        self._factors_fns = {}

        # optimizer-across-phases protocol: 'single' = recbole semantics (ONE
        # optimizer built at trainer construction, moments persist across
        # phases — the reference's behavior); 'per_phase' = fresh state each
        # phase. Default mirrors the reference.
        mode = (config["phase_optimizer"] or "single").lower()
        if mode not in ("single", "per_phase", "sparse"):
            raise ValueError(
                f"phase_optimizer must be 'single', 'per_phase' or 'sparse', "
                f"got {mode!r}"
            )
        learner = (config["learner"] or "adam").lower()
        self._single_opt = None
        if mode == "sparse" or (mode == "single" and learner == "sparse_adam"):
            # 'sparse' opt-in, or an explicit learner: sparse_adam — both get
            # the true torch.optim.SparseAdam semantics (row-lazy moments on
            # tables the model declares in sparse_spec, dense Adam elsewhere)
            self._single_opt = SparseAdam(config)
        elif mode == "single":
            try:
                self._single_opt = SingleOptimizer(config)
            except ValueError as e:
                # learners without a torch-exact shared-state form keep the
                # per-phase path — a default flip must not break configs that
                # trained fine before
                self.logger.warning(f"{e}; falling back to per_phase")
        self._shared_opt_state = None

        # optional Weights & Biases logging (reference `overall.yaml:14-15`)
        self._wandb = None
        if config["log_wandb"]:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=config["wandb_project"] or "recbole_cdr_tpu",
                           config=dict(config.final_config_dict))
            except Exception as e:  # wandb genuinely optional
                self.logger.warning(f"wandb logging disabled: {e}")

        # optional JAX profiler trace of the first N train steps
        self._profile_steps = int(config["profile_steps"] or 0)
        self._profiling = False

    # ---------------------------------------------------------------- params

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        """Every install of a new parameter pytree invalidates the model's
        host-side eval caches (BiTGCF keys its propagated-embedding cache on
        ``model.params_version``; keying on ``id(params)`` is unsound because
        CPython recycles ids after GC)."""
        self._params = value
        self.model.notify_params_updated()

    def _to_host(self, tree):
        """Host numpy copy of a (possibly vocab-sharded) pytree; multi-host
        safe (all-gathers non-fully-addressable shards first)."""
        from recbole_cdr_tpu.parallel.distributed import fetch_replicated

        return fetch_replicated(tree, self.mesh)

    # ---------------------------------------------------------------- phases

    def _reinit(self, phase_idx):
        self.best_valid_score = -np.inf if self.valid_metric_bigger else np.inf
        self.best_valid_result = None
        self.train_loss_dict = {}
        self.epochs = int(self.train_epochs[phase_idx])
        self.eval_step = min(self.config["eval_step"], self.epochs)
        self.cur_step = 0

    def _make_train_step(self, phase):
        # key via scoring_cache_key so models whose loss changes on a repeated
        # phase name (DCDCSR's second TARGET pass) get a fresh program
        cache_key = self.model.scoring_cache_key(phase)
        if cache_key in self._compiled:
            return self._compiled[cache_key]
        loss_fn = with_compute_dtype(self.model.loss_fn(phase), self.compute_dtype)
        tx = self._build_tx(phase)
        base_rng = jax.random.fold_in(self.rng, sum(ord(c) for c in phase) % (2**31))
        donate = (0, 1) if self.donate else ()

        def one_step(params, opt_state, batch, step):
            rng = jax.random.fold_in(base_rng, step)
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, rng)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        train_step = jax.jit(one_step, donate_argnums=donate)

        @partial(jax.jit, donate_argnums=donate)
        def train_scan(params, opt_state, batches, step0):
            """K sequential optimizer steps in ONE device call — amortizes
            host->device dispatch latency (critical over the TPU tunnel)."""

            def body(carry, xs):
                params, opt_state = carry
                batch, step = xs
                params, opt_state, loss = one_step(params, opt_state, batch, step)
                return (params, opt_state), loss

            k = jax.tree_util.tree_leaves(batches)[0].shape[0]
            steps = step0 + jnp.arange(k)
            (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), (batches, steps))
            return params, opt_state, jnp.sum(losses)

        self._compiled[cache_key] = (train_step, train_scan, tx)
        return train_step, train_scan, tx

    def _build_tx(self, phase):
        if self._single_opt is not None:
            return self._single_opt.for_phase(
                self.model.trainable_predicate(phase), list(self.params.keys())
            )
        return build_optimizer(
            self.config, self.model.trainable_predicate(phase),
            list(self.params.keys()),
        )

    def _init_opt_state(self, tx, params):
        """Phase-entry optimizer state: in 'single' mode the state persists
        from the previous phase (recbole semantics); otherwise fresh."""
        if self._single_opt is not None:
            return self._single_opt.ensure(params, self._shared_opt_state)
        return tx.init(params)

    def _device_batch(self, batch, stacked=False):
        """Move a host batch to device; under a mesh, shard the example axis
        over 'data' (stacked superstep batches keep the scan axis replicated).
        Multi-host: every process assembled the identical global batch (same
        seed, same pipeline) and contributes the slice its devices own
        (parallel/distributed.py per-host feeding)."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from jax.sharding import PartitionSpec as P

        from recbole_cdr_tpu.parallel.distributed import put_replicated, put_sharded

        spec = P(None, "data") if stacked else P("data")
        out = {}
        for k, v in batch.items():
            if np.ndim(v) == (2 if stacked else 1):
                out[k] = put_sharded(v, self.mesh, spec)
            else:
                out[k] = put_replicated(v, self.mesh)
        return out

    # ------------------------------------------------------------------- fit

    def fit(self, train_data, valid_data=None, verbose=True, saved=True,
            show_progress=False, callback_fn=None, resume_from=None):
        resume_state = None
        start_phase = 0
        if resume_from:
            resume_state = self.resume_checkpoint(resume_from)
            start_phase = int(resume_state.get("phase_idx", 0))
            if verbose:
                self.logger.info(
                    f"Resuming from [{resume_from}]: phase {start_phase} "
                    f"({self.train_modes[start_phase]}), "
                    f"epoch {int(resume_state.get('epoch', -1)) + 1}"
                )
        for phase_idx, scheme in enumerate(self.train_modes):
            self._cur_phase_idx = phase_idx
            if resume_state is not None and phase_idx < start_phase:
                # completed phase: replay only the host-side phase switch
                # (DCDCSR counts set_phase calls); its parameter surgery
                # already lives in the restored params
                self.model.set_phase(scheme)
                continue
            self._reinit(phase_idx)
            if verbose:
                self.logger.info(f"Start training with {scheme} mode")
            train_data.set_mode(train_mode2state[scheme])
            self.model.set_phase(scheme)
            start_epoch, opt_state0 = 0, None
            if resume_state is not None and phase_idx == start_phase:
                # partial phase: params already carry mutate_params_on_phase
                start_epoch = int(resume_state.get("epoch", -1)) + 1
                self.cur_step = int(resume_state.get("cur_step", 0))
                self.best_valid_score = resume_state.get(
                    "best_valid_score", self.best_valid_score
                )
                self.best_valid_result = resume_state.get("best_valid_result")
                if resume_state.get("opt_state") is not None:
                    opt_state0 = jax.tree_util.tree_map(
                        jnp.asarray, resume_state["opt_state"]
                    )
            else:
                self.params = self.model.mutate_params_on_phase(self.params, scheme)

            phase_valid = self._route_valid(scheme, valid_data)
            self._fit_phase(scheme, train_data, phase_valid, verbose, saved,
                            start_epoch=start_epoch, opt_state0=opt_state0)

        self.model.set_phase("OVERLAP")
        return self.best_valid_score, self.best_valid_result

    def _route_valid(self, scheme, valid_data):
        if self.split_valid_flag and valid_data is not None and isinstance(valid_data, tuple):
            source_valid, target_valid = valid_data
            return source_valid if scheme == "SOURCE" else target_valid
        return valid_data

    def _use_device_loop(self, scheme) -> bool:
        return bool(
            self.config["device_side_sampling"]
            and self.config["train_neg_sample_args"]["distribution"]
            in ("uniform", "popularity", "none")
            and not self.model.needs_host_augment(scheme)
        )

    def _fit_phase(self, scheme, train_data, valid_data, verbose, saved,
                   start_epoch=0, opt_state0=None):
        if self._use_device_loop(scheme):
            return self._fit_phase_device(scheme, train_data, valid_data, verbose,
                                          saved, start_epoch, opt_state0)
        train_step, train_scan, tx = self._make_train_step(scheme)
        opt_state = (
            opt_state0 if opt_state0 is not None
            else self._init_opt_state(tx, self.params)
        )
        params = self.params
        steps_per_call = max(1, int(self.config["steps_per_call"] or 1))

        stop = False
        step_counter = 0
        if self._profile_steps > 0 and not self._profiling:
            ensure_dir("log/profile")
            jax.profiler.start_trace("log/profile")
            self._profiling = True
        for epoch_idx in range(start_epoch, self.epochs):
            t0 = time.time()
            losses = []
            pending = []
            for batch in train_data:
                batch = self.model.augment_batch(batch, scheme)
                if steps_per_call == 1:
                    device_batch = self._device_batch(batch)
                    params, opt_state, loss = train_step(
                        params, opt_state, device_batch, step_counter
                    )
                    step_counter += 1
                    losses.append(loss)
                    continue
                pending.append(batch)
                if len(pending) == steps_per_call:
                    stacked = self._device_batch(
                        {k: np.stack([b[k] for b in pending]) for k in pending[0]},
                        stacked=True,
                    )
                    params, opt_state, loss = train_scan(
                        params, opt_state, stacked, step_counter
                    )
                    step_counter += len(pending)
                    losses.append(loss)
                    pending = []
            for batch in pending:  # remainder: single-step program
                device_batch = self._device_batch(batch)
                params, opt_state, loss = train_step(
                    params, opt_state, device_batch, step_counter
                )
                step_counter += 1
                losses.append(loss)
            epoch_loss = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
            self.train_loss_dict[epoch_idx] = epoch_loss
            if self._profiling and step_counter >= self._profile_steps:
                jax.profiler.stop_trace()
                self._profiling = False
                self._profile_steps = 0
            if self._wandb is not None:
                self._wandb.log({f"train/{scheme}_loss": epoch_loss, "epoch": epoch_idx})
            if verbose:
                self.logger.info(
                    set_color(f"epoch {epoch_idx} training", "green")
                    + f" [time: {time.time() - t0:.2f}s, "
                    + f"train loss: {epoch_loss:.{self.loss_decimal_place}f}]"
                )

            if valid_data is not None and self.eval_step and (epoch_idx + 1) % self.eval_step == 0:
                self.params = params
                valid_result = self._valid_epoch(scheme, valid_data)
                valid_score = valid_result.get(self.valid_metric, 0.0)
                if self._wandb is not None:
                    self._wandb.log({f"valid/{k}": v for k, v in valid_result.items()})
                if verbose:
                    self.logger.info(
                        set_color("valid result", "blue") + f": {valid_result}"
                    )
                improved = (
                    valid_score > self.best_valid_score
                    if self.valid_metric_bigger
                    else valid_score < self.best_valid_score
                )
                if improved:
                    self.best_valid_score = valid_score
                    self.best_valid_result = valid_result
                    self.cur_step = 0
                    self.best_params = self._to_host(params)
                    if saved:
                        self._save_checkpoint(epoch_idx, opt_state)
                else:
                    self.cur_step += 1
                    if self.stopping_step is not None and self.cur_step > self.stopping_step:
                        stop = True
                if stop:
                    if verbose:
                        self.logger.info("Finished training, best eval result in epoch "
                                         f"{epoch_idx - self.cur_step * self.eval_step}")
                    break

        self.params = params
        self._shared_opt_state = opt_state
        if valid_data is None and saved:
            self.best_params = self._to_host(params)
            self._save_checkpoint(self.epochs - 1, opt_state)

    def _fit_phase_device(self, scheme, train_data, valid_data, verbose, saved,
                          start_epoch=0, opt_state0=None):
        """Device-resident epoch path: negative sampling + batch assembly +
        all optimizer steps run in one jitted scan per epoch (see
        trainer/device_loop.py)."""
        from recbole_cdr_tpu.trainer.device_loop import DeviceEpochLoop

        sparse = None
        if isinstance(self._single_opt, SparseAdam):
            spec = self.model.sparse_spec(scheme)
            pred = self.model.trainable_predicate(scheme)
            if spec and all(pred(name) for name in spec):
                mask = {k: bool(pred(k)) for k in self.params.keys()}
                sparse = (spec, self._single_opt, mask)
            else:
                self.logger.warning(
                    f"phase_optimizer 'sparse': {type(self.model).__name__} "
                    f"declares no sparse_spec for phase {scheme} — falling "
                    "back to the dense update for this phase"
                )
        cache_key = ("device", self.model.scoring_cache_key(scheme),
                     sparse is not None)
        if cache_key not in self._compiled:
            loss_fn = with_compute_dtype(self.model.loss_fn(scheme), self.compute_dtype)
            tx = self._build_tx(scheme)
            neg_num = (
                self.config["train_neg_sample_args"].get("by", 0)
                if self.config["train_neg_sample_args"]["strategy"] == "by"
                else 0
            )
            base_rng = jax.random.fold_in(self.rng, (sum(ord(c) for c in scheme) + 7) % (2**31))
            loop = DeviceEpochLoop(
                train_mode2state[scheme], loss_fn, tx, train_data,
                self.config["MODEL_INPUT_TYPE"], neg_num,
                self.model.total_num_users, base_rng, mesh=self.mesh,
                donate=self.donate, sparse=sparse,
            )
            self._compiled[cache_key] = loop
        loop = self._compiled[cache_key]

        params = self.params
        opt_state = (
            opt_state0 if opt_state0 is not None
            else self._init_opt_state(loop.tx, params)
        )
        stop = False
        epoch_cursor = start_epoch
        # profile_steps on the production device path: trace the FIRST fused
        # dispatch (the epoch program repeats identically afterwards); the
        # host batching path traces per-step instead (`_fit_phase`)
        profiling_here = self._profile_steps > 0 and not self._profiling
        if profiling_here:
            ensure_dir("log/profile")
            jax.profiler.start_trace("log/profile")
            self._profiling = True
        try:
            while epoch_cursor < self.epochs:
                # fuse all epochs up to the next validation point into ONE device
                # dispatch (lax.scan over epochs): host cost between validations
                # collapses to a single call + one [n]-float loss readback
                if valid_data is not None and self.eval_step:
                    boundary = ((epoch_cursor // self.eval_step) + 1) * self.eval_step
                else:
                    boundary = self.epochs
                n_fused = min(boundary, self.epochs) - epoch_cursor
                t0 = time.time()
                if n_fused == 1:
                    params, opt_state, loss = loop.run_epoch(params, opt_state, epoch_cursor)
                    losses = [float(loss)]
                else:
                    params, opt_state, loss_arr = loop.run_epochs(
                        params, opt_state, epoch_cursor, n_fused
                    )
                    losses = [float(x) for x in np.asarray(loss_arr)]
                dt = (time.time() - t0) / n_fused
                if profiling_here:
                    # losses were read back above -> the dispatch completed
                    jax.profiler.stop_trace()
                    self._profiling = False
                    self._profile_steps = 0
                    profiling_here = False
                for i, epoch_loss in enumerate(losses):
                    epoch_idx = epoch_cursor + i
                    self.train_loss_dict[epoch_idx] = epoch_loss
                    if verbose:
                        self.logger.info(
                            set_color(f"epoch {epoch_idx} training", "green")
                            + f" [time: {dt:.2f}s, "
                            + f"train loss: {epoch_loss:.{self.loss_decimal_place}f}]"
                        )
                    if self._wandb is not None:
                        self._wandb.log({f"train/{scheme}_loss": epoch_loss, "epoch": epoch_idx})
                epoch_idx = epoch_cursor + n_fused - 1
                epoch_cursor += n_fused

                if valid_data is not None and self.eval_step and (epoch_idx + 1) % self.eval_step == 0:
                    self.params = params
                    valid_result = self._valid_epoch(scheme, valid_data)
                    valid_score = valid_result.get(self.valid_metric, 0.0)
                    if verbose:
                        self.logger.info(set_color("valid result", "blue") + f": {valid_result}")
                    if self._wandb is not None:
                        self._wandb.log({f"valid/{k}": v for k, v in valid_result.items()})
                    improved = (
                        valid_score > self.best_valid_score
                        if self.valid_metric_bigger
                        else valid_score < self.best_valid_score
                    )
                    if improved:
                        self.best_valid_score = valid_score
                        self.best_valid_result = valid_result
                        self.cur_step = 0
                        self.best_params = self._to_host(params)
                        if saved:
                            self._save_checkpoint(epoch_idx, opt_state)
                    else:
                        self.cur_step += 1
                        if self.stopping_step is not None and self.cur_step > self.stopping_step:
                            stop = True
                    if stop:
                        break

        finally:
            if profiling_here:
                # exception, early break, or a resumed phase with no
                # epochs left — close the trace instead of leaking it
                jax.profiler.stop_trace()
                self._profiling = False
                self._profile_steps = 0
        self.params = params
        self._shared_opt_state = opt_state
        if valid_data is None and saved:
            self.best_params = self._to_host(params)
            self._save_checkpoint(self.epochs - 1, opt_state)

    # ------------------------------------------------------------ validation

    def _score_fn_for(self, scheme, eval_batches):
        key = (self.model.scoring_cache_key(scheme), eval_batches.item_num)
        if key in self._score_fns:
            return self._score_fns[key]
        fs = with_compute_dtype(self.model.full_sort_fn(scheme), self.compute_dtype)
        if fs is not None:
            if getattr(fs, "_no_jit", False):
                fn = fs
            elif self.mesh is not None and jax.process_count() > 1:
                # multi-host: pin score outputs replicated so the evaluator's
                # host-side np.asarray sees fully-addressable data
                from jax.sharding import NamedSharding, PartitionSpec as P

                fn = jax.jit(fs, out_shardings=NamedSharding(self.mesh, P()))
            else:
                fn = jax.jit(fs)
        else:
            fn = make_predict_full_sort(
                self.model, scheme, eval_batches.item_num,
                compute_dtype=self.compute_dtype,
            )
        self._score_fns[key] = fn
        return fn

    def _evaluate_batches(self, scheme, eval_data):
        if getattr(eval_data, "is_labeled", False):
            # value metrics (AUC/MAE/RMSE/LogLoss) over labeled triples
            return self.value_evaluator.evaluate(
                with_compute_dtype(self.model.predict_fn(), self.compute_dtype),
                self.params, eval_data,
                self.model.TARGET_USER_ID, self.model.TARGET_ITEM_ID,
            )
        if getattr(eval_data, "is_candidate", False):
            return self.evaluator.evaluate_candidates(
                with_compute_dtype(self.model.predict_fn(), self.compute_dtype),
                self.params, eval_data,
                self.model.TARGET_USER_ID, self.model.TARGET_ITEM_ID,
            )
        # large item spaces: streaming tiled top-k when the model factors.
        # The wrapped factors fn is cached per scoring key — the evaluator
        # keys its fused-program cache on the fn OBJECT, so rebuilding the
        # wrapper every validation would re-trace the streaming program
        fkey = self.model.scoring_cache_key(scheme)
        if fkey not in self._factors_fns:
            self._factors_fns[fkey] = with_compute_dtype(
                self.model.full_sort_factors(scheme), self.compute_dtype
            )
        factors = self._factors_fns[fkey]
        threshold = int(self.config["streaming_topk_threshold"] or 32768)
        if (factors is not None and eval_data.item_num >= threshold
                and not self.evaluator.need_gauc):
            return self.evaluator.evaluate_streaming(
                factors, self.params, eval_data, mesh=self.mesh
            )
        score_fn = self._score_fn_for(scheme, eval_data)
        return self.evaluator.evaluate(score_fn, self.params, eval_data)

    def _valid_epoch(self, scheme, valid_data):
        # the model is already in phase `scheme` (set once on phase entry —
        # set_phase can have side effects like DCDCSR's phase counting, so it
        # must NOT be re-invoked here)
        return self._evaluate_batches(scheme, valid_data)

    # ------------------------------------------------------------ checkpoint

    def _save_checkpoint(self, epoch_idx, opt_state=None):
        """Persist params + per-phase scheduler state (+ optimizer state) so a
        run can restart mid-schedule (SURVEY §5 checkpoint-restart; the
        reference only reloads finished models, `quick_start.py:99-130`).

        Multi-host discipline: collective ops (``_to_host`` resharding, the
        orbax sharded save) run on EVERY process — gating them behind the
        coordinator would deadlock the collective; only the metadata pickle
        is single-writer (all hosts hold identical scheduler state)."""
        state = {
            "config": self.config,
            "epoch": epoch_idx,
            "cur_step": self.cur_step,
            "phase_idx": getattr(self, "_cur_phase_idx", 0),
            "train_modes": list(self.train_modes),
            "best_valid_score": self.best_valid_score,
            "best_valid_result": self.best_valid_result,
            "model": self.config["model"],
        }
        if opt_state is not None:
            state["opt_state"] = self._to_host(opt_state)  # collective
        backend = self.config["checkpoint_backend"] or "pickle"
        if backend == "orbax":
            import orbax.checkpoint as ocp

            path = os.path.abspath(self.saved_model_file + ".orbax")
            # every process participates: each host writes the shards it owns;
            # force=True replaces an existing checkpoint via orbax's atomic
            # tmp-dir + rename (a host-side rmtree would race across hosts)
            ocp.PyTreeCheckpointer().save(path, self.params, force=True)
            state["params_path"] = path
        else:
            state["params"] = self.best_params
        if jax.process_count() > 1 and jax.process_index() != 0:
            return
        with open(self.saved_model_file, "wb") as f:
            pickle.dump(state, f)

    def resume_checkpoint(self, model_file):
        with open(model_file, "rb") as f:
            state = pickle.load(f)
        if "params_path" in state:
            import orbax.checkpoint as ocp

            params = ocp.PyTreeCheckpointer().restore(state["params_path"])
        else:
            params = state["params"]
        if self.mesh is not None:
            # re-apply the mesh placement (saved tables were already padded)
            from recbole_cdr_tpu.parallel.mesh import shard_params

            self.params = shard_params(
                jax.tree_util.tree_map(np.asarray, params), self.mesh
            )
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.best_params = self._to_host(self.params)
        return state

    # -------------------------------------------------------------- evaluate

    def evaluate(self, eval_data, load_best_model=True, model_file=None, show_progress=False):
        if load_best_model:
            if model_file is not None:
                self.resume_checkpoint(model_file)
            elif self.best_params is not None:
                self.params = jax.tree_util.tree_map(jnp.asarray, self.best_params)
        # fit() already left the model in its final 'OVERLAP' scoring state
        # (reference `trainer/trainer.py:75`); don't re-trigger set_phase hooks
        if self.model.phase != "OVERLAP":
            self.model.set_phase("OVERLAP")
        return self._evaluate_batches("OVERLAP", eval_data)


class DCDCSRTrainer(CrossDomainTrainer):
    """DCDCSR's variant: no validation during the BOTH (mapping) phase
    (reference `trainer/trainer.py:124-125`)."""

    def _route_valid(self, scheme, valid_data):
        if scheme == "BOTH":
            return None
        return super()._route_valid(scheme, valid_data)
