"""Microbenchmarks for the device-loop hot components at bench scale.

Times (a) the rejection sampler at various R, (b) threefry vs rbg PRNG for
the per-step draw volume, (c) an exact sorted-rank complement sampler
(fixpoint shift), (d) epoch permutation cost. Run on the real chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 8192
H = 400
N_USERS = 42000
N_CAND = 7999
R = 16


def timeit(tag, fn, *args, n=50):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:42s} {dt*1e3:8.4f} ms")
    return dt


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(1.4, N_USERS) * 8, H).astype(np.int32)
    hist = np.full((N_USERS, H), N_CAND + 1, np.int32)
    for u in range(0, N_USERS, 97):  # sparse fill is enough for timing
        hist[u, : deg[u]] = rng.choice(N_CAND, deg[u], replace=False) + 1
    cand = np.arange(1, N_CAND + 1, dtype=np.int32)
    uids = rng.integers(0, N_USERS, B).astype(np.int32)
    return jnp.asarray(hist), jnp.asarray(cand), jnp.asarray(uids)


def rejection(rounds):
    # R threaded as an explicit argument — mutating dl.R_ROUNDS around a
    # lazily-traced @jax.jit function would time R=16 for every row (the
    # restore ran before the first call triggered tracing; ADVICE r1)
    from recbole_cdr_tpu.trainer import device_loop as dl

    @jax.jit
    def f(rng, uids, hist, cand):
        return dl._sample_negatives(rng, uids, hist, cand, 1, rounds=rounds)

    return f


def main():
    hist, cand, uids = make_data()
    key = jax.random.PRNGKey(0)

    for rounds in (16, 8, 4, 2):
        timeit(f"rejection sampler R={rounds}", rejection(rounds), key, uids, hist, cand)

    # gather-only: what does hist[uids] alone cost?
    @jax.jit
    def gather_only(uids):
        return hist[uids].sum()

    timeit("hist row gather [B,H] + sum", gather_only, uids)

    # PRNG draw volume per step (2 domains x R x B randint + 3 splits)
    @jax.jit
    def draws(key):
        a = jax.random.randint(key, (R, B), 0, N_CAND)
        b = jax.random.randint(jax.random.fold_in(key, 1), (R, B), 0, N_CAND)
        return a.sum() + b.sum()

    timeit("threefry randint 2x[16,8192]", draws, key)

    rbg_key = jax.random.key(0, impl="rbg")

    @jax.jit
    def draws_rbg(key):
        a = jax.random.randint(key, (R, B), 0, N_CAND)
        b = jax.random.randint(jax.random.fold_in(key, 1), (R, B), 0, N_CAND)
        return a.sum() + b.sum()

    timeit("rbg      randint 2x[16,8192]", draws_rbg, rbg_key)

    # epoch permutation (amortized over ~19 steps at bench scale)
    @jax.jit
    def perm(key):
        return jax.random.permutation(key, 600000).astype(jnp.int32)

    d = timeit("permutation 600k (threefry)", perm, key)
    print(f"{'':42s} -> {d/19*1e3:8.4f} ms/step amortized")

    @jax.jit
    def perm_rbg(key):
        return jax.random.permutation(key, 600000).astype(jnp.int32)

    timeit("permutation 600k (rbg)", perm_rbg, rbg_key)

    # exact complement sampler: hist rows pre-converted to sorted ranks into
    # cand; draw r in [0, n_cand - deg); fixpoint shift K passes
    K = 3

    def exact(key, uids, hist_ranks, degs):
        hr = hist_ranks[uids]                       # [B, H] sorted ranks, pad=n_cand+1
        deg = degs[uids]
        r = jax.random.randint(key, (B,), 0, N_CAND - deg)
        cur = r
        CH = 32
        n_chunks = H // CH
        for _ in range(K):
            def body(cnt, c):
                chunk = jax.lax.dynamic_slice_in_dim(hr, c * CH, CH, axis=1)
                return cnt + jnp.sum(chunk <= cur[:, None], axis=1), 0.0
            cnt, _ = jax.lax.scan(body, jnp.zeros(B, jnp.int32), jnp.arange(n_chunks))
            cur = r + cnt
        return cand[cur]

    # pre-convert hist rows to the sampler's stated precondition: SORTED
    # ranks into cand (id i <-> rank i-1 in this synthetic setup), padded
    # past any reachable rank — raw unsorted id rows would violate the
    # algorithm's contract and produce wrong outputs (ADVICE r1)
    hist_np = np.asarray(hist)
    sorted_hist = np.sort(hist_np, axis=1)
    hist_ranks = jnp.asarray(
        np.where(sorted_hist <= N_CAND, sorted_hist - 1, N_CAND + 1), jnp.int32
    )
    degs = jnp.asarray((hist_np < N_CAND + 1).sum(1), jnp.int32)
    f = jax.jit(lambda k, u: exact(k, u, hist_ranks, degs))
    timeit(f"exact complement sampler K={K}", f, key, uids)


if __name__ == "__main__":
    main()
