"""Race the streaming full-sort top-k variants against the dense path on the
real chip at Book-Crossing shape (153,431 items — reference
`results/Book-Crossing.md:61-68`), with synthetic factor tables.

Round-3 measured the old streaming path at ~110 users/s vs 44,450 dense
(BENCH_r03). This harness isolates the device programs (no dataset build) to
attribute the rework:

  dense[B]        scan over user tiles: [B, I] matmul -> scatter masks -> top_k
  old[B,tile]     round-3 streaming: running [B,k] carry, per-tile
                  top_k(k+tile) merge, vmapped searchsorted history mask
  new[B,tile]     per-tile top_k(k) emitted via scan ys + ONE final merge,
                  [B,H] scatter-min history mask (ops/topk.py)

Timing: each variant processes the full 13,581-user set (production segment
structure: one jitted program, seg user-tiles per dispatch), 1 warm pass then
the median of 3 timed passes, blocked at the end. Per CLAUDE.md, short
dispatch bursts through the tunnel lie — a full pass is hundreds of ms of
back-pressured device work.

Usage: python tools/race_streaming.py  (TPU; strictly one process)
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/recbole_cdr_tpu/xla"),
)

U, I, D, K, H = 13581, 153431, 64, 10, 64
SEG_ELEMS = 1 << 28


U_MAX_PAD = -(-U // 1024) * 1024
# independent streams so every variant sees IDENTICAL data regardless of its
# padding (a shared stream would shift the table draw with U_pad)
_USER = np.random.default_rng(1).normal(size=(U_MAX_PAD, D)).astype(np.float32)
_TABLE = np.random.default_rng(2).normal(size=(I, D)).astype(np.float32)
_HIST = np.random.default_rng(3).integers(1, I, (U_MAX_PAD, H)).astype(np.int32)
_MASK = np.random.default_rng(4).random((U_MAX_PAD, H)) < 0.4


def _inputs(B):
    n_tiles = -(-U // B)
    U_pad = n_tiles * B
    user_e = jnp.asarray(_USER[:U_pad])
    table = jnp.asarray(_TABLE)
    hist_j = jnp.asarray(_HIST[:U_pad])
    mask_j = jnp.asarray(_MASK[:U_pad])
    return user_e, table, None, hist_j, mask_j, n_tiles


def _seg(B, n_tiles, per_tile_elems):
    seg = max(1, min(n_tiles, SEG_ELEMS // max(per_tile_elems, 1)))
    return seg, -(-n_tiles // seg)


# ---------------------------------------------------------- dense reference
def make_dense(B, seg_tiles):
    @jax.jit
    def run(user_e, table, hist, mask, tile0):
        def body(_, i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, (tile0 + i) * B, B, 0)
            scores = sl(user_e) @ table.T
            rows = jnp.arange(B)[:, None]
            h, m = sl(hist), sl(mask)
            scores = scores.at[rows, jnp.where(m, h, 0)].min(
                jnp.where(m, jnp.finfo(scores.dtype).min, jnp.inf)
            )
            scores = scores.at[:, 0].set(jnp.finfo(scores.dtype).min)
            return None, jax.lax.top_k(scores, K)[1]

        _, topk = jax.lax.scan(body, None, jnp.arange(seg_tiles))
        return topk.reshape(seg_tiles * B, K)

    return run


# ------------------------------------------------------- old (r3) streaming
def _old_stream_local(user_e, table, hist_sorted, k, tile):
    B, D_ = user_e.shape
    I_ = table.shape[0]
    n_tiles = (I_ + tile - 1) // tile
    padded = n_tiles * tile
    neg_inf = jnp.finfo(user_e.dtype).min
    table = jnp.pad(table, ((0, padded - I_), (0, 0)))
    Hh = hist_sorted.shape[1]

    def in_history(col_ids):
        pos = jax.vmap(lambda h: jnp.searchsorted(h, col_ids))(hist_sorted)
        pos = jnp.minimum(pos, Hh - 1)
        return jnp.take_along_axis(hist_sorted, pos, axis=1) == col_ids[None, :]

    def body(carry, tile_idx):
        best_s, best_i = carry
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D_))
        scores = user_e @ rows.T
        col_ids = start + jnp.arange(tile)
        valid = (col_ids < I_) & (col_ids != 0)
        scores = jnp.where(valid[None, :], scores, neg_inf)
        scores = jnp.where(in_history(col_ids), neg_inf, scores)
        cat_s = jnp.concatenate([best_s, scores], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(col_ids[None, :].astype(jnp.int32), (B, tile))],
            axis=1,
        )
        new_s, pos = jax.lax.top_k(cat_s, k)
        return (new_s, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (jnp.full((B, k), neg_inf, user_e.dtype), jnp.zeros((B, k), jnp.int32))
    (best_s, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return best_s, best_i


def make_old(B, seg_tiles, tile):
    @jax.jit
    def run(user_e, table, hist, mask, tile0):
        def body(_, i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, (tile0 + i) * B, B, 0)
            hist_sorted = jnp.sort(jnp.where(sl(mask), sl(hist), I), axis=1)
            _, topk = _old_stream_local(sl(user_e), table, hist_sorted, K, tile)
            return None, topk

        _, topk = jax.lax.scan(body, None, jnp.arange(seg_tiles))
        return topk.reshape(seg_tiles * B, K)

    return run


# ------------------------------------------------------------ new streaming
def make_new(B, seg_tiles, tile):
    from recbole_cdr_tpu.ops.topk import streaming_topk_with_history

    @jax.jit
    def run(user_e, table, hist, mask, tile0):
        def body(_, i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, (tile0 + i) * B, B, 0)
            hist_ids = jnp.where(sl(mask), sl(hist), I)
            _, topk = streaming_topk_with_history(
                sl(user_e), table, hist_ids, K, tile=tile
            )
            return None, topk

        _, topk = jax.lax.scan(body, None, jnp.arange(seg_tiles))
        return topk.reshape(seg_tiles * B, K)

    return run


def time_variant(name, fn, inputs, n_segs, seg, B, n_passes=3, max_seconds=120):
    user_e, table, hist_ids, hist_j, mask_j, _ = inputs
    args = (user_e, table, hist_j, mask_j)

    def one_pass():
        # np.asarray forces the full device->host readback per dispatch, the
        # same back-pressure the production evaluator applies;
        # block_until_ready alone can return early through the axon tunnel
        # (CLAUDE.md "wall-clock timing ... LIES")
        return [
            np.asarray(fn(*args, jnp.int32(s * seg))) for s in range(n_segs)
        ]

    t0 = time.perf_counter()
    outs = one_pass()  # warm/compile
    warm = time.perf_counter() - t0
    times = []
    for _ in range(n_passes):
        t0 = time.perf_counter()
        one_pass()
        times.append(time.perf_counter() - t0)
        if sum(times) > max_seconds:
            break
    med = sorted(times)[len(times) // 2]
    print(
        f"{name:26s} users/s={U / med:10.1f}  pass={med * 1e3:8.1f}ms  "
        f"warm={warm:6.1f}s  segs={n_segs}x{seg}t x{B}u",
        flush=True,
    )
    return U / med, np.concatenate(outs)[:U]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    ref = None
    for name, B, tile, maker, per_tile in [
        ("dense B=26", 26, None, None, 26 * I),
        ("dense B=256", 256, None, None, 256 * I),
        ("dense B=512", 512, None, None, 512 * I),
        ("new B=256 tile=8k", 256, 8192, make_new, 256 * I),
        ("new B=256 tile=16k", 256, 16384, make_new, 256 * I),
        ("new B=256 tile=32k", 256, 32768, make_new, 256 * I),
        ("new B=512 tile=16k", 512, 16384, make_new, 512 * I),
        ("new B=1024 tile=16k", 1024, 16384, make_new, 1024 * I),
        ("new B=128 tile=16k", 128, 16384, make_new, 128 * I),
        ("old B=26 tile=8k", 26, 8192, make_old, 26 * I * 8),
        ("old B=256 tile=8k", 256, 8192, make_old, 256 * I * 8),
    ]:
        inputs = _inputs(B)
        n_tiles = inputs[-1]
        seg, n_segs = _seg(B, n_tiles, per_tile)
        if maker is None:
            fn = make_dense(B, seg)
        else:
            fn = maker(B, seg, tile)
        try:
            ups, topk = time_variant(name, fn, inputs, n_segs, seg, B)
            results[name] = round(ups, 1)
            if name == "dense B=26":
                ref = topk
            elif ref is not None:
                eq = bool((topk == ref).all())
                if not eq:
                    print(f"  !! {name} topk mismatch vs dense B=26: "
                          f"{(topk != ref).any(axis=1).sum()} rows differ")
                results[name + " ==dense"] = eq
        except Exception as e:
            print(f"{name:26s} ERROR {type(e).__name__}: {e}", flush=True)
            results[name] = f"error: {e}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
