"""Round-2 race: attribute the remaining streaming top-k cost and try a
group-max pre-reduction.

race_streaming.py showed the reworked streaming path within ~1.15x of dense
(30.1k vs 34.6k users/s at 153k items) with the matmul accounting for only
~1% of the time — the per-tile ``lax.top_k`` dominates. The classic exact
reduction: with contiguous column groups of size g, every global top-k
element lives in a top-k group by group-max (an element of global rank r has
at most r-1 groups with a strictly greater max). So: group-max reduce
[B, T] -> [B, T/g] (cheap VPU), top_k over the g-fold narrower row, gather
the k winning groups' columns, final top_k over [B, k*g].

Tie-break caveat (measured separately before adoption): equal scores in
different groups can merge in group-max-rank order rather than column order,
which can diverge from dense's lowest-index tie-break. Real trained-embedding
score ties are vanishingly rare; the masked -inf slots never surface while
>= k valid items exist.

Usage: python tools/race_streaming2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/recbole_cdr_tpu/xla"),
)

from tools.race_streaming import (  # noqa: E402
    I, U, K, _inputs, _seg, time_variant,
)

D = 64


def grouped_tile_topk(scores, start, k, g):
    """Exact top-k of [B, T] via group-max pre-reduction (see module doc)."""
    B, T = scores.shape
    gm = scores.reshape(B, T // g, g).max(axis=2)
    _, gi = jax.lax.top_k(gm, k)                      # [B, k] group ids
    cols = (gi[:, :, None] * g
            + jnp.arange(g, dtype=gi.dtype)[None, None, :]).reshape(B, k * g)
    cand = jnp.take_along_axis(scores, cols, axis=1)  # [B, k*g]
    s, p = jax.lax.top_k(cand, k)
    return s, start + jnp.take_along_axis(cols, p, axis=1).astype(jnp.int32)


def make_variant(B, seg_tiles, tile, mode, g=8):
    n_tiles = (I + tile - 1) // tile
    padded = n_tiles * tile
    neg_inf = jnp.finfo(jnp.float32).min

    def local_topk(user_e, table, hist_ids):
        brows = jnp.arange(B, dtype=jnp.int32)[:, None]

        def body(_, tile_idx):
            start = tile_idx * tile
            rows = jax.lax.dynamic_slice(table, (start, 0), (tile, D))
            scores = user_e @ rows.T
            col_ids = start + jnp.arange(tile, dtype=jnp.int32)
            valid = (col_ids < I) & (col_ids != 0)
            scores = jnp.where(valid[None, :], scores, neg_inf)
            if mode != "nomask":
                local = hist_ids - start
                inb = (local >= 0) & (local < tile)
                safe = jnp.where(inb, local, 0)
                scores = scores.at[brows, safe].min(
                    jnp.where(inb, neg_inf, jnp.inf), mode="drop"
                )
            if mode == "maxonly":
                m = scores.max(axis=1)
                return None, (
                    jnp.broadcast_to(m[:, None], (B, K)),
                    jnp.zeros((B, K), jnp.int32),
                )
            if mode == "grouped":
                s, i = grouped_tile_topk(scores, start, K, g)
                return None, (s, i)
            s, p = jax.lax.top_k(scores, K)
            return None, (s, start + p.astype(jnp.int32))

        _, (ss, ii) = jax.lax.scan(body, None, jnp.arange(n_tiles))
        cat_s = jnp.swapaxes(ss, 0, 1).reshape(B, n_tiles * K)
        cat_i = jnp.swapaxes(ii, 0, 1).reshape(B, n_tiles * K)
        best_s, pos = jax.lax.top_k(cat_s, K)
        return jnp.take_along_axis(cat_i, pos, axis=1)

    @jax.jit
    def run(user_e, table, hist, mask, tile0):
        tbl = jnp.pad(table, ((0, padded - I), (0, 0)))

        def body(_, i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, (tile0 + i) * B, B, 0)
            hist_ids = jnp.where(sl(mask), sl(hist), I)
            return None, local_topk(sl(user_e), tbl, hist_ids)

        _, topk = jax.lax.scan(body, None, jnp.arange(seg_tiles))
        return topk.reshape(seg_tiles * B, K)

    return run


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    ref = None
    for name, B, tile, mode, g in [
        ("plain B=256 t=32k", 256, 32768, "plain", 0),
        ("plain B=256 t=64k", 256, 65536, "plain", 0),
        ("nomask B=256 t=32k", 256, 32768, "nomask", 0),
        ("maxonly B=256 t=32k", 256, 32768, "maxonly", 0),
        ("grouped8 B=256 t=32k", 256, 32768, "grouped", 8),
        ("grouped16 B=256 t=32k", 256, 32768, "grouped", 16),
        ("grouped32 B=256 t=32k", 256, 32768, "grouped", 32),
        ("grouped16 B=256 t=64k", 256, 65536, "grouped", 16),
        ("grouped16 B=256 t=160k", 256, 163840, "grouped", 16),
        ("grouped16 B=512 t=160k", 512, 163840, "grouped", 16),
        ("grouped16 B=26 t=160k", 26, 163840, "grouped", 16),
    ]:
        inputs = _inputs(B)
        n_utiles = inputs[-1]
        seg, n_segs = _seg(B, n_utiles, B * I)
        fn = make_variant(B, seg, tile, mode, g)
        try:
            ups, topk = time_variant(name, fn, inputs, n_segs, seg, B)
            results[name] = round(ups, 1)
            if name == "plain B=256 t=32k":
                ref = topk
            elif ref is not None and mode != "maxonly":
                eq = bool((topk == ref).all())
                if not eq:
                    print(f"  !! {name}: {(topk != ref).any(axis=1).sum()} rows differ")
                results[name + " ==plain"] = eq
        except Exception as e:
            print(f"{name:26s} ERROR {type(e).__name__}: {e}", flush=True)
            results[name] = f"error: {e}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
