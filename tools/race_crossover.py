"""Measure the dense-vs-streaming full-sort crossover on the item axis
(round 5, VERDICT r4 #5: route by measurement, not a 1M-item constant).

Synthetic factor tables (no dataset build), production-shaped programs:

  dense[B]      scan over user tiles: [B, I] matmul -> [B, I] top_k
  stream[B,t]   ops/topk streaming: per-tile top_k + one merge

Both on the full 13,581-user set, 1 warm pass + best of 3 timed passes with
a blocking readback (CLAUDE.md: short bursts through the tunnel lie).
History masking is omitted on BOTH sides — it costs the same per element on
each path and the crossover is driven by the top-k structure (dense sorts
the full [B, I] row; streaming sorts 32k-wide tiles and merges once).

Usage: python tools/race_crossover.py   (TPU; strictly one process)
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

from recbole_cdr_tpu.ops.topk import streaming_topk_scores

U, D, K = 13581, 64, 10
B = 2048
TILE = 32768
U_PAD = -(-U // B) * B

_USER = np.random.default_rng(1).normal(size=(U_PAD, D)).astype(np.float32)


@partial(jax.jit, static_argnames=("n_tiles",))
def dense_pass(user_e, table, n_tiles):
    def body(_, t):
        u = jax.lax.dynamic_slice_in_dim(user_e, t * B, B, 0)
        scores = u @ table.T
        return None, jax.lax.top_k(scores, K)[1]

    _, out = jax.lax.scan(body, None, jnp.arange(n_tiles))
    return out


@partial(jax.jit, static_argnames=("n_tiles",))
def stream_pass(user_e, table, n_tiles):
    def body(_, t):
        u = jax.lax.dynamic_slice_in_dim(user_e, t * B, B, 0)
        return None, streaming_topk_scores(u, table, K, TILE,
                                           mask_pad_col=False)[1]

    _, out = jax.lax.scan(body, None, jnp.arange(n_tiles))
    return out


def best_of(fn, reps=3):
    np.asarray(fn())  # warm/compile + readback
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    user_e = jnp.asarray(_USER)
    n_tiles = U_PAD // B
    rows = []
    for I in (16384, 32768, 65536, 98304, 131072, 153431):
        table = jnp.asarray(
            np.random.default_rng(2).normal(size=(I, D)).astype(np.float32)
        )
        d = best_of(lambda: dense_pass(user_e, table, n_tiles))
        s = best_of(lambda: stream_pass(user_e, table, n_tiles))
        rows.append({
            "items": I,
            "dense_users_per_s": round(U / d, 0),
            "stream_users_per_s": round(U / s, 0),
            "winner": "stream" if s < d else "dense",
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"crossover_rows": rows}))


if __name__ == "__main__":
    main()
