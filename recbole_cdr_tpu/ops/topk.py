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


def _stream_topk_hist_local(user_e, table, hist_sorted, k: int, tile: int,
                            col_offset, total_items: int):
    """Streaming masked top-k over one (possibly sharded) item block.

    ``table`` is a [I_local, D] block whose row j is GLOBAL item id
    ``col_offset + j``; rows at or past ``total_items`` are padding. History
    membership is a batched binary search against the replicated
    ``hist_sorted`` using global ids, so shard-local results merge exactly.
    """
    B, D = user_e.shape
    I_local = table.shape[0]
    n_tiles = (I_local + tile - 1) // tile
    padded = n_tiles * tile
    neg_inf = jnp.finfo(user_e.dtype).min
    table = jnp.pad(table, ((0, padded - I_local), (0, 0)))

    H = hist_sorted.shape[1]

    def in_history(col_ids):
        # [B, tile] membership via per-row binary search
        pos = jax.vmap(lambda h: jnp.searchsorted(h, col_ids))(hist_sorted)
        pos = jnp.minimum(pos, H - 1)
        return jnp.take_along_axis(hist_sorted, pos, axis=1) == col_ids[None, :]

    def body(carry, tile_idx):
        best_s, best_i = carry
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D))
        scores = user_e @ rows.T
        col_ids = col_offset + start + jnp.arange(tile)
        valid = (col_ids < total_items) & (col_ids != 0) & \
            (start + jnp.arange(tile) < I_local)
        scores = jnp.where(valid[None, :], scores, neg_inf)
        scores = jnp.where(in_history(col_ids), neg_inf, scores)
        cat_s = jnp.concatenate([best_s, scores], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(col_ids[None, :].astype(jnp.int32), (B, tile))],
            axis=1,
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
    return _stream_topk_hist_local(
        user_e, item_table, hist_sorted, k, tile, 0, item_table.shape[0]
    )


def make_sharded_streaming_topk(mesh, k: int, tile: int = 8192):
    """Build a jitted mesh-sharded full-sort top-k: the item axis is
    partitioned over the mesh's 'model' axis and the user batch over 'data';
    each device runs the local streaming top-k over its item shard, then an
    ``all_gather`` over 'model' merges the m*k per-shard candidates into the
    global top-k.

    This is the TPU answer to the reference's ``eval_batch_size``-chunked
    full-sort at Book-Crossing scale (153k items, eval_batch up to 4,096,000
    — `results/Book-Crossing.md:52`, chunked scoring `conet.py:222-242`):
    score memory is O(B/d * (tile + k)) per device and the item-axis work
    scales with the 'model' axis.

    Returns ``fn(user_e [B, D], item_table [I, D], hist_sorted [B, H])
    -> (scores [B, k], indices [B, k])``, exactly equal to
    :func:`streaming_topk_with_history` (tested on an 8-device CPU mesh).
    Build ONCE per eval pass — the returned fn is jit-cached over the static
    batch shapes.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    m = mesh.shape.get("model", 1)
    d = mesh.shape.get("data", 1)
    # multi-host: replicate the tiny [B, k] outputs so the evaluator's
    # host-side np.asarray sees fully-addressable data
    jit_kwargs = {}
    if jax.process_count() > 1:
        rep = NamedSharding(mesh, P())
        jit_kwargs["out_shardings"] = (rep, rep)

    @partial(jax.jit, **jit_kwargs)
    def run(user_e, item_table, hist_sorted):
        I = item_table.shape[0]
        B = user_e.shape[0]
        local_I = -(-I // m)
        pad_rows = local_I * m - I
        pad_users = (-(-B // d)) * d - B
        table = jnp.pad(item_table, ((0, pad_rows), (0, 0)))
        users = jnp.pad(user_e, ((0, pad_users), (0, 0)))
        hist = jnp.pad(hist_sorted, ((0, pad_users), (0, 0)), constant_values=I)

        def local(u, table_shard, h):
            offset = jax.lax.axis_index("model") * local_I
            s, i = _stream_topk_hist_local(u, table_shard, h, k, tile, offset, I)
            s_all = jax.lax.all_gather(s, "model")           # [m, B/d, k]
            i_all = jax.lax.all_gather(i, "model")
            cat_s = jnp.swapaxes(s_all, 0, 1).reshape(u.shape[0], m * k)
            cat_i = jnp.swapaxes(i_all, 0, 1).reshape(u.shape[0], m * k)
            best_s, pos = jax.lax.top_k(cat_s, k)
            return best_s, jnp.take_along_axis(cat_i, pos, axis=1)

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P("data", None), P("model", None), P("data", None)),
            out_specs=(P("data", None), P("data", None)),
            check_rep=False,
        )
        s, i = fn(users, table, hist)
        return s[:B], i[:B]

    return run
