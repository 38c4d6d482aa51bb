"""`phase_optimizer: single` — torch-semantics optimizer state shared across
phases (recbole builds ONE optimizer in Trainer.__init__; reference
`trainer/trainer.py:43-76` reuses it every phase).

Pins the exact torch.optim.Adam semantics: per-parameter lazy state (a
parameter's step count only advances on steps where it has a grad), weight
decay as L2-into-grad, moments persisting across freeze/unfreeze
boundaries."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from recbole_cdr_tpu.trainer.trainer import SingleOptimizer


CFG = {"learner": "adam", "learning_rate": 1e-2, "weight_decay": 0.0,
       "clip_grad_norm": None}


def _torch_reference(params, grads_by_phase, masks_by_phase, lr, wd=0.0):
    tp = {k: torch.tensor(np.asarray(v), requires_grad=True)
          for k, v in params.items()}
    opt = torch.optim.Adam(list(tp.values()), lr=lr, weight_decay=wd)
    for grads_seq, mask in zip(grads_by_phase, masks_by_phase):
        for grads in grads_seq:
            opt.zero_grad(set_to_none=True)
            for k, t in tp.items():
                if mask[k]:
                    t.grad = torch.tensor(np.asarray(grads[k]))
            opt.step()
    return {k: t.detach().numpy() for k, t in tp.items()}


def _framework(params, grads_by_phase, masks_by_phase, cfg):
    single = SingleOptimizer(cfg)
    p = {k: jnp.asarray(v) for k, v in params.items()}
    state = None
    for grads_seq, mask in zip(grads_by_phase, masks_by_phase):
        tx = single.for_phase(lambda k: mask[k], list(p.keys()))
        state = single.ensure(p, state)
        for grads in grads_seq:
            g = {k: jnp.asarray(v) for k, v in grads.items()}
            updates, state = tx.update(g, state, p)
            p = optax.apply_updates(p, updates)
    return {k: np.asarray(v) for k, v in p.items()}


def _random_case(seed, n_steps=(3, 2)):
    rng = np.random.default_rng(seed)
    params = {"a": rng.normal(size=(4, 3)).astype(np.float32),
              "b": rng.normal(size=(2, 2)).astype(np.float32)}
    grads_by_phase = [
        [{k: rng.normal(size=v.shape).astype(np.float32)
          for k, v in params.items()} for _ in range(n)]
        for n in n_steps
    ]
    return params, grads_by_phase


def test_single_optimizer_matches_torch_adam_across_phases():
    params, grads = _random_case(0)
    # phase 1: only 'a' trains; phase 2: both — 'b' starts its Adam state
    # LATE (torch lazy init) while 'a' carries moments across the boundary
    masks = [{"a": True, "b": False}, {"a": True, "b": True}]
    want = _torch_reference(params, grads, masks, lr=CFG["learning_rate"])
    got = _framework(params, grads, masks, CFG)
    for k in params:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)


def test_single_optimizer_weight_decay_matches_torch():
    cfg = dict(CFG, weight_decay=0.05)
    params, grads = _random_case(1)
    masks = [{"a": True, "b": True}, {"a": False, "b": True}]
    want = _torch_reference(params, grads, masks, lr=cfg["learning_rate"],
                            wd=0.05)
    got = _framework(params, grads, masks, cfg)
    for k in params:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)


def test_single_optimizer_clip_plus_weight_decay_matches_torch():
    """torch order: clip_grad_norm_ on RAW grads, then Adam adds wd*p."""
    cfg = dict(CFG, weight_decay=0.05, clip_grad_norm={"max_norm": 0.5})
    params, grads = _random_case(7)
    masks = [{"a": True, "b": True}, {"a": True, "b": False}]

    tp = {k: torch.tensor(np.asarray(v), requires_grad=True)
          for k, v in params.items()}
    opt = torch.optim.Adam(list(tp.values()), lr=cfg["learning_rate"],
                           weight_decay=0.05)
    for grads_seq, mask in zip(grads, masks):
        for g in grads_seq:
            opt.zero_grad(set_to_none=True)
            for k, t in tp.items():
                if mask[k]:
                    t.grad = torch.tensor(np.asarray(g[k]))
            torch.nn.utils.clip_grad_norm_(
                [t for k, t in tp.items() if mask[k]], 0.5
            )
            opt.step()
    want = {k: t.detach().numpy() for k, t in tp.items()}
    got = _framework(params, grads, masks, cfg)
    for k in params:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)


def test_single_optimizer_unsupported_learner_falls_back():
    """adagrad has no torch-exact shared-state form: default 'single' must
    fall back to per_phase instead of crashing previously-working configs."""
    from recbole_cdr_tpu.quick_start import objective_function

    r = objective_function(config_dict={
        "model": "CMF", "state": "ERROR", "show_progress": False,
        "train_batch_size": 512, "eval_batch_size": 4096,
        "train_epochs": ["BOTH:1"], "learner": "adagrad",
    }, saved=False)
    assert np.isfinite(r["test_result"]["mrr@10"])


def test_single_optimizer_frozen_params_untouched():
    params, grads = _random_case(2, n_steps=(4,))
    masks = [{"a": True, "b": False}]
    got = _framework(params, grads, masks, CFG)
    np.testing.assert_array_equal(got["b"], params["b"])
    assert not np.allclose(got["a"], params["a"])


def test_single_optimizer_nested_subtrees():
    rng = np.random.default_rng(3)
    params = {"mlp": {"w1": rng.normal(size=(3, 3)).astype(np.float32),
                      "b1": rng.normal(size=(3,)).astype(np.float32)},
              "emb": rng.normal(size=(5, 2)).astype(np.float32)}
    grads = [{
        "mlp": {"w1": rng.normal(size=(3, 3)).astype(np.float32),
                "b1": rng.normal(size=(3,)).astype(np.float32)},
        "emb": rng.normal(size=(5, 2)).astype(np.float32),
    } for _ in range(3)]
    single = SingleOptimizer(CFG)
    p = jax.tree_util.tree_map(jnp.asarray, params)
    tx = single.for_phase(lambda k: k != "emb", list(p.keys()))
    state = single.ensure(p, None)
    for g in grads:
        updates, state = tx.update(jax.tree_util.tree_map(jnp.asarray, g), state, p)
        p = optax.apply_updates(p, updates)
    np.testing.assert_array_equal(np.asarray(p["emb"]), params["emb"])
    assert int(state["count"]["mlp"]) == 3 and int(state["count"]["emb"]) == 0


def test_ensure_carries_state_and_zero_inits_new_keys():
    params, grads = _random_case(4, n_steps=(2,))
    single = SingleOptimizer(CFG)
    p = jax.tree_util.tree_map(jnp.asarray, params)
    tx = single.for_phase(lambda k: True, list(p.keys()))
    state = single.ensure(p, None)
    for g in grads[0]:
        updates, state = tx.update(jax.tree_util.tree_map(jnp.asarray, g), state, p)
        p = optax.apply_updates(p, updates)
    # phase surgery adds a derived table (DCDCSR pattern)
    p2 = dict(p, extra=jnp.ones((2, 2)))
    state2 = single.ensure(p2, state)
    assert int(state2["count"]["a"]) == 2
    assert int(state2["count"]["extra"]) == 0
    np.testing.assert_array_equal(np.asarray(state2["mu"]["a"]),
                                  np.asarray(state["mu"]["a"]))


def test_phase_optimizer_modes_run_e2e():
    from recbole_cdr_tpu.quick_start import objective_function

    base = {
        "model": "EMCDR", "state": "ERROR", "show_progress": False,
        "train_batch_size": 512, "eval_batch_size": 4096,
        "train_epochs": ["SOURCE:1", "TARGET:1", "OVERLAP:1"], "seed": 2022,
    }
    for mode in ("single", "per_phase"):
        r = objective_function(config_dict={**base, "phase_optimizer": mode},
                               saved=False)
        assert np.isfinite(r["test_result"]["mrr@10"])
    with pytest.raises(ValueError):
        objective_function(config_dict={**base, "phase_optimizer": "bogus"},
                           saved=False)
