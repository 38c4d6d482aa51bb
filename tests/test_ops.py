"""Unit tests for the ops layer (streaming top-k)."""

import jax
import jax.numpy as jnp
import numpy as np

from recbole_cdr_tpu.ops import streaming_topk_scores


def test_streaming_topk_matches_dense():
    rng = np.random.default_rng(0)
    B, I, D, k = 7, 1000, 16, 10
    user_e = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)

    s, idx = streaming_topk_scores(user_e, items, k=k, tile=128)
    dense = np.array(user_e @ items.T)
    dense[:, 0] = -np.inf  # PAD col masked
    expect_idx = np.argsort(-dense, axis=1)[:, :k]
    expect_s = np.take_along_axis(dense, expect_idx, axis=1)
    np.testing.assert_allclose(np.asarray(s), expect_s, rtol=1e-5)
    # indices may tie-break differently; scores must match
    got = np.take_along_axis(dense, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got, expect_s, rtol=1e-5)


def test_streaming_topk_uneven_tiles():
    rng = np.random.default_rng(1)
    B, I, D, k = 3, 517, 8, 5
    user_e = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
    s, idx = streaming_topk_scores(user_e, items, k=k, tile=128)
    assert np.asarray(idx).max() < I
    assert (np.asarray(idx) != 0).all()


def test_streaming_topk_k_larger_than_tile():
    """k > tile: each tile keeps all its candidates; the merge stays exact
    (the r4 per-tile-top_k rework must not narrow the supported k range)."""
    from recbole_cdr_tpu.ops import streaming_topk_with_history

    rng = np.random.default_rng(2)
    B, I, D, k, tile = 4, 300, 8, 50, 32
    user_e = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(I, D)), jnp.float32)
    hist = jnp.full((B, 3), I, jnp.int32)  # empty histories (sentinel)
    s, idx = streaming_topk_with_history(user_e, items, hist, k=k, tile=tile)
    dense = np.array(user_e @ items.T)
    dense[:, 0] = -np.inf
    expect_idx = np.argsort(-dense, kind="stable", axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), expect_idx)
