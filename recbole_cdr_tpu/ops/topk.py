"""Streaming full-sort top-k: score the item axis in tiles and carry a running
top-k, so the full [B, num_items] score matrix never materializes in HBM.

This is the TPU answer to the reference's ``eval_batch_size``-chunked full-sort
(SURVEY §5 "long-context"): the item axis is tiled (and, on a mesh, sharded),
each tile's scores feed ``jax.lax.top_k`` merged with the carry. Memory is
O(B * (tile + k)) instead of O(B * num_items).
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "tile"))
def streaming_topk_scores(user_e, item_table, k: int, tile: int = 8192,
                          mask_pad_col: bool = True):
    """Args:
        user_e: [B, D] user representations.
        item_table: [I, D] item representations (the contiguous scoring space).
        k: top-k to keep.
        tile: item-axis tile size.
    Returns (topk_scores [B, k], topk_indices [B, k]).
    """
    B, D = user_e.shape
    I = item_table.shape[0]
    n_tiles = (I + tile - 1) // tile
    padded = n_tiles * tile
    neg_inf = jnp.finfo(user_e.dtype).min

    pad_rows = padded - I
    table = jnp.pad(item_table, ((0, pad_rows), (0, 0)))

    def body(carry, tile_idx):
        best_s, best_i = carry
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D))
        scores = user_e @ rows.T                                   # [B, tile]
        col_ids = start + jnp.arange(tile)
        valid = col_ids < I
        if mask_pad_col:
            valid = valid & (col_ids != 0)
        scores = jnp.where(valid[None, :], scores, neg_inf)
        cat_s = jnp.concatenate([best_s, scores], axis=1)          # [B, k+tile]
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(col_ids[None, :], (B, tile))], axis=1
        )
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((B, k), neg_inf, user_e.dtype),
        jnp.zeros((B, k), jnp.int32),
    )
    (best_s, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return best_s, best_i


@partial(jax.jit, static_argnames=("k", "tile"))
def streaming_topk_with_history(user_e, item_table, hist_sorted, k: int,
                                tile: int = 8192):
    """Streaming top-k with per-user history masking.

    Args:
        hist_sorted: [B, H] each user's history item ids SORTED ascending and
            padded with a sentinel >= item_table.shape[0]. Membership per tile
            is a batched binary search (O(tile log H)), so the full [B, I]
            mask never materializes.
    Returns (topk_scores [B, k], topk_indices [B, k]).
    """
    B, D = user_e.shape
    I = item_table.shape[0]
    n_tiles = (I + tile - 1) // tile
    padded = n_tiles * tile
    neg_inf = jnp.finfo(user_e.dtype).min
    table = jnp.pad(item_table, ((0, padded - I), (0, 0)))

    H = hist_sorted.shape[1]

    def in_history(col_ids):
        # [B, tile] membership via per-row binary search
        pos = jax.vmap(lambda h: jnp.searchsorted(h, col_ids))(hist_sorted)
        pos = jnp.minimum(pos, H - 1)
        found = jnp.take_along_axis(hist_sorted, pos, axis=1) == col_ids[None, :]
        return found

    def body(carry, tile_idx):
        best_s, best_i = carry
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D))
        scores = user_e @ rows.T
        col_ids = start + jnp.arange(tile)
        valid = (col_ids < I) & (col_ids != 0)
        scores = jnp.where(valid[None, :], scores, neg_inf)
        scores = jnp.where(in_history(col_ids), neg_inf, scores)
        cat_s = jnp.concatenate([best_s, scores], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(col_ids[None, :], (B, tile))], axis=1
        )
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    init = (
        jnp.full((B, k), neg_inf, user_e.dtype),
        jnp.zeros((B, k), jnp.int32),
    )
    (best_s, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return best_s, best_i
