"""Per-step bit-equivalence: framework JAX losses vs the independent torch
oracle (tools/oracle_models.py) on shared batches.

For every model and every training phase: one real batch from the
framework's own pipeline runs through the framework ``loss_fn`` (JAX
value_and_grad) and through the torch oracle (autograd recomputes the
backward pass from the reference's equations) — loss AND the full gradient
pytree must agree to float32 tolerance. For the phase-mutating models
(DCDCSR) the benchmark/affine parameter surgery is compared tensor-for-
tensor. A one-epoch Adam run from identical init must land on matching
parameters. This is the committed evidence behind results/parity_oracle.md
(VERDICT r2 missing #2).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from recbole_cdr_tpu.config import CDRConfig
from recbole_cdr_tpu.data.dataset import CrossDomainDataset
from recbole_cdr_tpu.data.utils import data_preparation
from recbole_cdr_tpu.utils import get_model, init_seed
from recbole_cdr_tpu.utils.enums import train_mode2state

from tools.oracle_models import ORACLES, to_torch

LOSS_TOL = dict(rtol=2e-4, atol=1e-6)
GRAD_TOL = dict(rtol=2e-3, atol=2e-6)


def _setup(model_name, extra=None):
    config = CDRConfig(
        model=model_name,
        config_dict={"state": "ERROR", "show_progress": False,
                     "train_batch_size": 512, "eval_batch_size": 8192,
                     **(extra or {})},
        _cli_args=[],
    )
    init_seed(config["seed"], True)
    dataset = CrossDomainDataset(config)
    train_data, _, _ = data_preparation(config, dataset)
    model = get_model(model_name)(config, dataset)
    params = model.init_params(jax.random.PRNGKey(7))
    return config, dataset, train_data, model, params


def _grab_batch(train_data, model, phase):
    """One full (unpadded) batch from the framework loader in ``phase``."""
    train_data.set_mode(train_mode2state[phase])
    batch = next(iter(train_data))
    # leave the loader reusable for the next phase
    train_data.source_batcher.pr = 0
    train_data.target_batcher.pr = 0
    train_data.overlap_batcher.pr = 0
    batch = model.augment_batch(batch, phase)
    for k in batch:
        if k.endswith("sample_weight"):
            w = np.asarray(batch[k])
            assert w[: int(w.sum())].all(), "expected a padding-suffix batch"
    return batch


def _epoch_batches(train_data, model, phase):
    train_data.set_mode(train_mode2state[phase])
    batches = [model.augment_batch(b, phase) for b in train_data]
    return batches


def _flatten(tree):
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    return [(jax.tree_util.keystr(p), l) for p, l in leaves]


def _assert_tree_close(jax_tree, torch_tree, tol, grad=False):
    j = _flatten(jax_tree)
    t = _flatten(torch_tree)
    assert [k for k, _ in j] == [k for k, _ in t]
    for (key, jl), (_, tl) in zip(j, t):
        if not isinstance(tl, torch.Tensor) or not tl.is_floating_point():
            continue
        tv = tl.grad if grad else tl
        tv = np.zeros(tl.shape, np.float32) if tv is None else tv.detach().numpy()
        np.testing.assert_allclose(np.asarray(jl), tv, err_msg=key, **tol)


def _check_phase(model, params, oracle, train_data, phase, phase_count=1):
    batch = _grab_batch(train_data, model, phase)
    loss_fn = model.loss_fn(phase)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    jloss, jgrads = jax.value_and_grad(lambda p: loss_fn(p, jbatch, None))(params)

    tp = to_torch(params)
    kwargs = {"phase_count": phase_count} if model.__class__.__name__ == "DCDCSR" else {}
    tloss = oracle.loss(tp, batch, model, phase, **kwargs)
    tloss.backward()

    np.testing.assert_allclose(float(jloss), float(tloss.detach()), **LOSS_TOL)
    _assert_tree_close(jgrads, tp, GRAD_TOL, grad=True)
    return batch


def _check_full_sort(model, params, oracle, phase="TARGET", n_users=8, tol=None):
    fs = model.full_sort_fn(phase)
    if fs is None:
        return
    users = np.arange(1, 1 + n_users, dtype=np.int64)
    j = np.asarray(fs(params, jnp.asarray(users)))
    tp = to_torch(params)
    with torch.no_grad():
        t = oracle.full_sort(tp, model, torch.as_tensor(users)).numpy()
    np.testing.assert_allclose(j, t, **(tol or dict(rtol=2e-4, atol=2e-5)))


# ---------------------------------------------------------------- BOTH models

@pytest.mark.parametrize("name", ["CMF", "CLFM", "CoNet", "DeepAPF"])
def test_both_phase_models(name):
    _, _, train_data, model, params = _setup(name)
    oracle = ORACLES[name]()
    model.set_phase("BOTH")
    _check_phase(model, params, oracle, train_data, "BOTH")
    _check_full_sort(model, params, oracle)


def test_dtcdr_neumf():
    # dropout 0: the reference applies train-mode dropout the framework drives
    # from an rng the test sets to None — zero rate makes both deterministic
    _, _, train_data, model, params = _setup("DTCDR", {"dropout_prob": 0.0})
    oracle = ORACLES["DTCDR"]()
    model.set_phase("BOTH")
    _check_phase(model, params, oracle, train_data, "BOTH")


def test_dtcdr_dmf():
    _, _, train_data, model, params = _setup(
        "DTCDR", {"base_model": "DMF", "dropout_prob": 0.0})
    oracle = ORACLES["DTCDR"]()
    model.set_phase("BOTH")
    _check_phase(model, params, oracle, train_data, "BOTH")


def test_bitgcf():
    # drop_rate 0: the reference applies train-mode dropout (bitgcf.py:134)
    # that the framework drives from an rng the test sets to None — zero rate
    # makes both sides deterministic
    _, dataset, train_data, model, params = _setup("BiTGCF", {"drop_rate": 0.0})
    oracle = ORACLES["BiTGCF"]()
    oracle.prepare(dataset, model)
    model.set_phase("BOTH")
    # propagation chains two sparse matmuls + normalizations: accumulation
    # order differs between XLA and torch-sparse, so tolerance is looser
    batch = _grab_batch(train_data, model, "BOTH")
    loss_fn = model.loss_fn("BOTH")
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    jloss, jgrads = jax.value_and_grad(lambda p: loss_fn(p, jbatch, None))(params)
    tp = to_torch(params)
    tloss = oracle.loss(tp, batch, model, "BOTH")
    tloss.backward()
    np.testing.assert_allclose(float(jloss), float(tloss.detach()), rtol=1e-3)
    _assert_tree_close(jgrads, tp, dict(rtol=5e-3, atol=5e-5), grad=True)
    _check_full_sort(model, params, oracle, tol=dict(rtol=1e-3, atol=1e-4))


# --------------------------------------------------------------- phase models

def test_emcdr_all_phases():
    _, _, train_data, model, params = _setup("EMCDR")
    oracle = ORACLES["EMCDR"]()
    for phase in ("SOURCE", "TARGET", "OVERLAP"):
        model.set_phase(phase)
        _check_phase(model, params, oracle, train_data, phase)
    _check_full_sort(model, params, oracle, phase="OVERLAP")


def test_sscdr_all_phases():
    _, _, train_data, model, params = _setup("SSCDR")
    oracle = ORACLES["SSCDR"]()
    for phase in ("SOURCE", "TARGET", "OVERLAP"):
        model.set_phase(phase)
        _check_phase(model, params, oracle, train_data, phase)
    _check_full_sort(model, params, oracle, phase="OVERLAP")


def test_natr_both_phases():
    _, _, train_data, model, params = _setup("NATR")
    oracle = ORACLES["NATR"]()
    for phase in ("SOURCE", "TARGET"):
        model.set_phase(phase)
        _check_phase(model, params, oracle, train_data, phase)


def test_dcdcsr_schedule_with_param_surgery():
    """SOURCE -> TARGET -> BOTH (benchmark build) -> TARGET#2 (affine build),
    checking the loss at every stage AND the derived embeddings themselves."""
    _, _, train_data, model, params = _setup("DCDCSR")
    oracle = ORACLES["DCDCSR"]()

    model.set_phase("SOURCE")
    _check_phase(model, params, oracle, train_data, "SOURCE")
    model.set_phase("TARGET")
    _check_phase(model, params, oracle, train_data, "TARGET", phase_count=1)

    model.set_phase("BOTH")
    params = model.mutate_params_on_phase(params, "BOTH")
    bench_t = oracle.build_benchmark(to_torch(params), model)
    np.testing.assert_allclose(
        np.asarray(params["benchmark_embedding"]), bench_t.numpy(),
        rtol=2e-4, atol=2e-6,
    )
    _check_phase(model, params, oracle, train_data, "BOTH")

    model.set_phase("TARGET")  # second TARGET pass
    params = model.mutate_params_on_phase(params, "TARGET")
    affine_t = oracle.build_affine(to_torch(params), model)
    np.testing.assert_allclose(
        np.asarray(params["affine_embedding"]), affine_t.numpy(),
        rtol=2e-4, atol=2e-6,
    )
    _check_phase(model, params, oracle, train_data, "TARGET", phase_count=2)
    _check_full_sort(model, params, oracle, phase="TARGET")


# ----------------------------------------------------------- one-epoch deltas

@pytest.mark.parametrize("name,phase", [("CMF", "BOTH"), ("EMCDR", "SOURCE")])
def test_one_epoch_adam_parameter_match(name, phase):
    """A full epoch of Adam steps over the identical batch stream, from
    identical init, lands on matching parameters (optax.adam vs torch Adam)."""
    config, _, train_data, model, params = _setup(
        name, {"train_batch_size": 2048})
    model.set_phase(phase)
    batches = _epoch_batches(train_data, model, phase)
    lr = float(config["learning_rate"])
    loss_fn = model.loss_fn(phase)

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, b):
        _, g = jax.value_and_grad(lambda q: loss_fn(q, b, None))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    jp = params
    for b in batches:
        jp, opt_state = step(jp, opt_state, {k: jnp.asarray(v) for k, v in b.items()})

    tp = to_torch(params)
    leaves = [l for l in jax.tree_util.tree_leaves(tp) if l.is_floating_point()]
    opt = torch.optim.Adam(leaves, lr=lr)
    oracle = ORACLES[name]()
    for b in batches:
        opt.zero_grad()
        oracle.loss(tp, b, model, phase).backward()
        opt.step()

    _assert_tree_close(jp, tp, dict(rtol=5e-3, atol=1e-5))
