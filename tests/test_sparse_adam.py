"""SparseAdam (phase_optimizer: sparse) — torch.optim.SparseAdam parity.

The opt-in row-sparse optimizer (trainer.SparseAdam) must reproduce
torch.optim.SparseAdam exactly: row-lazy moments, coalesced duplicate
indices, per-param step counts, SparseAdam's ``sqrt(nu)+eps`` denominator
with bias corrections folded into the step size. Plus an e2e check that the
sparse device loop trains CMF on the bundled pair and actually learns.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp


def _mk_opt():
    from recbole_cdr_tpu.trainer.trainer import SparseAdam

    class Cfg(dict):
        def __getitem__(self, k):
            return self.get(k)

    return SparseAdam(Cfg(learning_rate=0.01, learner="adam"))


def test_row_update_matches_torch_sparse_adam():
    rng = np.random.default_rng(0)
    N, D, R, steps = 50, 8, 24, 5
    p0 = rng.normal(size=(N, D)).astype(np.float32)

    opt = _mk_opt()
    jp = jnp.asarray(p0)
    jmu = jnp.zeros((N, D), jnp.float32)
    jnu = jnp.zeros((N, D), jnp.float32)

    tp = torch.tensor(p0.copy(), requires_grad=True)
    topt = torch.optim.SparseAdam([tp], lr=0.01)

    for s in range(1, steps + 1):
        # duplicate-heavy index set: coalescing must match torch's
        ids = rng.integers(0, N, R).astype(np.int32)
        g = rng.normal(size=(R, D)).astype(np.float32)

        jp, jmu, jnu = opt.row_update(
            jp, jmu, jnu, jnp.asarray(g), jnp.asarray(ids), jnp.int32(s)
        )

        i = torch.as_tensor(ids.astype(np.int64))[None, :]
        sg = torch.sparse_coo_tensor(i, torch.as_tensor(g), size=(N, D))
        tp.grad = sg
        topt.step()

        np.testing.assert_allclose(
            np.asarray(jp), tp.detach().numpy(), rtol=2e-6, atol=2e-7,
            err_msg=f"step {s}",
        )


def test_sparse_cmf_learns_on_bundled_pair():
    from recbole_cdr_tpu.quick_start import objective_function

    r = objective_function(config_dict={
        "model": "CMF", "state": "ERROR", "show_progress": False,
        "train_batch_size": 512, "eval_batch_size": 4096,
        "train_epochs": ["BOTH:8"], "phase_optimizer": "sparse",
    }, saved=False)
    res = r["test_result"]
    assert all(np.isfinite(v) for v in res.values()), res
    # the pair is small but learnable: an untrained model scores ~0.01 MRR
    assert res["mrr@10"] > 0.03, res


def test_sparse_rejects_weight_decay():
    import pytest

    from recbole_cdr_tpu.trainer.trainer import SparseAdam

    class Cfg(dict):
        def __getitem__(self, k):
            return self.get(k)

    with pytest.raises(ValueError, match="weight_decay"):
        SparseAdam(Cfg(learning_rate=0.01, weight_decay=0.1))


def test_sparse_emcdr_all_phases():
    """EMCDR's 3-phase schedule under phase_optimizer sparse: the MF phases
    use per-domain specs, OVERLAP shares one batch key across both tables
    (the aligned-offset case the device loop checks statically)."""
    from recbole_cdr_tpu.quick_start import objective_function

    r = objective_function(config_dict={
        "model": "EMCDR", "state": "ERROR", "show_progress": False,
        "train_batch_size": 512, "eval_batch_size": 4096,
        "train_epochs": ["SOURCE:2", "TARGET:2", "OVERLAP:2"],
        "phase_optimizer": "sparse",
    }, saved=False)
    res = r["test_result"]
    assert all(np.isfinite(v) for v in res.values()), res


def test_sparse_dcdcsr_schedule_with_fallback_phases():
    """DCDCSR under phase_optimizer sparse: pairwise BPR phases run row-
    sparse; BOTH (host-augment) and the frozen affine buffer exercise the
    dense fallback inside the same shared optimizer state."""
    from recbole_cdr_tpu.quick_start import objective_function

    r = objective_function(config_dict={
        "model": "DCDCSR", "state": "ERROR", "show_progress": False,
        "train_batch_size": 512, "eval_batch_size": 4096,
        "train_epochs": ["SOURCE:1", "TARGET:1", "BOTH:1", "TARGET:1"],
        "phase_optimizer": "sparse",
    }, saved=False)
    res = r["test_result"]
    assert all(np.isfinite(v) for v in res.values()), res


def test_row_update_all_duplicate_ids():
    """Degenerate coalesce: every occurrence hits ONE row — the scatter-min
    first-occurrence form must sum all R grads into a single update."""
    N, D, R = 20, 4, 16
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(N, D)).astype(np.float32)
    g = rng.normal(size=(R, D)).astype(np.float32)
    ids = np.full(R, 7, np.int32)

    opt = _mk_opt()
    jp, jmu, jnu = opt.row_update(
        jnp.asarray(p0), jnp.zeros((N, D)), jnp.zeros((N, D)),
        jnp.asarray(g), jnp.asarray(ids), jnp.int32(1),
    )

    tp = torch.tensor(p0.copy(), requires_grad=True)
    topt = torch.optim.SparseAdam([tp], lr=0.01)
    i = torch.as_tensor(ids.astype(np.int64))[None, :]
    tp.grad = torch.sparse_coo_tensor(i, torch.as_tensor(g), size=(N, D))
    topt.step()
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=2e-6, atol=2e-7)
    # untouched rows and their moments unchanged
    np.testing.assert_array_equal(np.asarray(jmu)[:7], 0.0)
    np.testing.assert_array_equal(np.asarray(jp)[:7], p0[:7])
