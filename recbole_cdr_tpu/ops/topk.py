"""Streaming full-sort top-k: score the item axis in tiles and keep only each
tile's top-k, so the full [B, num_items] score matrix never materializes in
HBM.

This is the TPU answer to the reference's ``eval_batch_size``-chunked full-sort
(SURVEY §5 "long-context"): the item axis is tiled (and, on a mesh, sharded),
each tile contributes its local ``jax.lax.top_k`` winners, and one final merge
over the [B, n_tiles*k] candidates produces the global top-k. Memory is
O(B * (tile + n_tiles*k)) instead of O(B * num_items).

Design notes (measured on a real v5e chip, 153,431 items, D=64 — the
Book-Crossing shape from reference `results/Book-Crossing.md:61-68`):

- The round-3 implementation carried a running [B, k] best set and, per tile,
  concatenated it with the tile's [B, tile] scores and ran
  ``top_k(B, k+tile)`` — a data dependence chain that serializes every tile
  behind a wide sort. Emitting only each tile's [B, k] winners through scan
  ``ys`` and merging ONCE removes the carry entirely; XLA then pipelines the
  matmul of tile t+1 against the top-k of tile t.
- History masking was a vmapped per-row ``searchsorted`` + gather per tile
  (O(B*tile*log H) serial gathers — TPUs execute gathers scalar-at-a-time).
  Replaced by a scatter: each history id falls in at most one tile, so a
  [B, H] ``scatter-min`` of -inf into the tile's [B, tile] scores masks
  exactly the same slots at O(B*H) per tile with no gathers.
- Tie semantics match the dense evaluator bit-for-bit: ``lax.top_k`` breaks
  ties by lowest index, per-tile candidates are emitted in (tile, rank) order
  with within-tile ties already index-ascending, so the stable final merge
  picks the lowest global item id — identical to one top_k over the full row.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _score_dot(user_e, rows):
    """[B, D] x [tile, D] -> [B, tile] scores, always accumulated/output in
    f32 (``preferred_element_type``): callers may pass bf16 factors (half the
    item-table HBM traffic, 2x MXU rate) while top-k/masking/tie-breaking
    stay exact f32 — the "bf16 scoring, f32 accumulation" eval mode."""
    return jax.lax.dot_general(
        user_e, rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

def _merge_tile_topk(ss, ii, k: int):
    """[n_tiles, B, kt] per-tile winners -> global top-k (scores, ids).

    Candidates concatenate in (tile, rank) order, so the stable final
    ``top_k`` preserves the dense evaluator's lowest-index tie-break."""
    n_tiles, B, kt = ss.shape
    cat_s = jnp.swapaxes(ss, 0, 1).reshape(B, n_tiles * kt)
    cat_i = jnp.swapaxes(ii, 0, 1).reshape(B, n_tiles * kt)
    best_s, pos = jax.lax.top_k(cat_s, k)
    return best_s, jnp.take_along_axis(cat_i, pos, axis=1)


def _tile_k(k: int, tile: int, n_tiles: int) -> int:
    """Per-tile keep count: min(k, tile) — a tile only holds ``tile``
    candidates, so keeping them all stays exact when k > tile (a global
    rank-r element has at most r-1 better rows in its own tile)."""
    kt = min(k, tile)
    if n_tiles * kt < k:
        raise ValueError(
            f"top-k {k} exceeds the padded item axis ({n_tiles}x{tile})"
        )
    return kt


@partial(jax.jit, static_argnames=("k", "tile", "mask_pad_col"))
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
    kt = _tile_k(k, tile, n_tiles)
    padded = n_tiles * tile
    neg_inf = jnp.finfo(jnp.float32).min  # scores are f32 (see _score_dot)

    table = jnp.pad(item_table, ((0, padded - I), (0, 0)))

    def body(_, tile_idx):
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D))
        scores = _score_dot(user_e, rows)                          # [B, tile] f32
        col_ids = start + jnp.arange(tile, dtype=jnp.int32)
        valid = col_ids < I
        if mask_pad_col:
            valid = valid & (col_ids != 0)
        scores = jnp.where(valid[None, :], scores, neg_inf)
        s, p = jax.lax.top_k(scores, kt)                           # [B, kt]
        return None, (s, start + p.astype(jnp.int32))

    _, (ss, ii) = jax.lax.scan(body, None, jnp.arange(n_tiles))
    return _merge_tile_topk(ss, ii, k)


def _stream_topk_hist_local(user_e, table, hist_ids, k: int, tile: int,
                            col_offset, total_items: int):
    """Streaming masked top-k over one (possibly sharded) item block.

    ``table`` is a [I_local, D] block whose row j is GLOBAL item id
    ``col_offset + j``; rows at or past ``total_items`` are padding.
    ``hist_ids`` is [B, H] GLOBAL history item ids, padded with any sentinel
    >= ``total_items`` (order does not matter). Each history id lands in at
    most one tile, where a [B, H] scatter-min pushes that slot to -inf —
    shard-local results therefore merge exactly.
    """
    B, D = user_e.shape
    I_local = table.shape[0]
    n_tiles = (I_local + tile - 1) // tile
    kt = _tile_k(k, tile, n_tiles)
    padded = n_tiles * tile
    neg_inf = jnp.finfo(jnp.float32).min  # scores are f32 (see _score_dot)
    table = jnp.pad(table, ((0, padded - I_local), (0, 0)))
    brows = jnp.arange(B, dtype=jnp.int32)[:, None]

    def body(_, tile_idx):
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D))
        scores = _score_dot(user_e, rows)                          # [B, tile] f32
        g0 = col_offset + start
        col_ids = (g0 + jnp.arange(tile, dtype=jnp.int32))
        valid = (col_ids < total_items) & (col_ids != 0) & \
            (start + jnp.arange(tile) < I_local)
        scores = jnp.where(valid[None, :], scores, neg_inf)
        # history ids falling inside this tile -> scatter -inf at their column
        local = hist_ids.astype(jnp.int32) - g0                    # [B, H]
        inb = (local >= 0) & (local < tile)
        safe = jnp.where(inb, local, 0)
        scores = scores.at[brows, safe].min(
            jnp.where(inb, neg_inf, jnp.inf), mode="drop"
        )
        s, p = jax.lax.top_k(scores, kt)
        return None, (s, g0 + p.astype(jnp.int32))

    _, (ss, ii) = jax.lax.scan(body, None, jnp.arange(n_tiles))
    return _merge_tile_topk(ss, ii, k)


def _stream_topk_hist_pairs(user_e, table, hrows, hitems, hvalid, k: int,
                            tile: int, col_offset, total_items: int):
    """Streaming masked top-k with history given as ITEM-TILE-partitioned
    (row, item) pair lists, each [n_tiles, P] — the tail-robust form the
    fused evaluator uses (a [B, H] matrix scales with the heaviest user's
    degree; pair lists with the sum). Partitioning by item tile means tile t
    scatters only ITS pairs instead of every tile re-scanning the full list
    (the full-list scatter cost ~20% of eval wall time, raced on v5e).
    Semantics identical to :func:`_stream_topk_hist_local`."""
    B, D = user_e.shape
    I_local = table.shape[0]
    n_tiles = (I_local + tile - 1) // tile
    kt = _tile_k(k, tile, n_tiles)
    assert hrows.shape[0] == n_tiles, (hrows.shape, n_tiles)
    padded = n_tiles * tile
    neg_inf = jnp.finfo(jnp.float32).min  # scores are f32 (see _score_dot)
    table = jnp.pad(table, ((0, padded - I_local), (0, 0)))

    def body(_, tile_idx):
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D))
        scores = _score_dot(user_e, rows)                          # [B, tile] f32
        g0 = col_offset + start
        col_ids = (g0 + jnp.arange(tile, dtype=jnp.int32))
        valid = (col_ids < total_items) & (col_ids != 0) & \
            (start + jnp.arange(tile) < I_local)
        scores = jnp.where(valid[None, :], scores, neg_inf)
        pr = lambda a: jax.lax.dynamic_slice_in_dim(a, tile_idx, 1, 0)[0]
        tr, ti, tv = pr(hrows), pr(hitems), pr(hvalid)
        local = ti.astype(jnp.int32) - g0
        inb = tv & (local >= 0) & (local < tile)
        scores = scores.at[
            jnp.where(inb, tr, 0), jnp.where(inb, local, 0)
        ].min(jnp.where(inb, neg_inf, jnp.inf), mode="drop")
        s, p = jax.lax.top_k(scores, kt)
        return None, (s, g0 + p.astype(jnp.int32))

    _, (ss, ii) = jax.lax.scan(body, None, jnp.arange(n_tiles))
    return _merge_tile_topk(ss, ii, k)


@partial(jax.jit, static_argnames=("k", "tile"))
def streaming_topk_with_history(user_e, item_table, hist_ids, k: int,
                                tile: int = 8192):
    """Streaming top-k with per-user history masking.

    Args:
        hist_ids: [B, H] each user's history item ids (any order), padded
            with a sentinel >= item_table.shape[0]. Masking per tile is a
            [B, H] scatter of -inf, so the full [B, I] mask never
            materializes.
    Returns (topk_scores [B, k], topk_indices [B, k]).
    """
    return _stream_topk_hist_local(
        user_e, item_table, hist_ids, k, tile, 0, item_table.shape[0]
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

    Returns ``fn(user_e [B, D], item_table [I, D], hist_ids [B, H])
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
    def run(user_e, item_table, hist_ids):
        I = item_table.shape[0]
        B = user_e.shape[0]
        local_I = -(-I // m)
        pad_rows = local_I * m - I
        pad_users = (-(-B // d)) * d - B
        table = jnp.pad(item_table, ((0, pad_rows), (0, 0)))
        users = jnp.pad(user_e, ((0, pad_users), (0, 0)))
        hist = jnp.pad(hist_ids, ((0, pad_users), (0, 0)), constant_values=I)

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
