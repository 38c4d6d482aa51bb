"""Device-resident epoch execution: the TPU-native training hot path.

Instead of the host assembling every batch (sampler -> pad -> stack ->
transfer), the interaction arrays, per-user history matrix and candidate-id
lists live in HBM; ONE jitted program per epoch draws every step's negatives
and assembles every step's batch arrays IN BULK, then a ``lax.scan`` walks
the per-step slices applying loss/grad/optimizer. Host work per epoch
collapses to one dispatch.

Why bulk-then-scan (measured on the real chip, tools/_scan_probe history):
the identical rejection sampler costs 0.036 ms as one batched call but
~1.1 ms/step when embedded per-step inside the scan body — XLA schedules
small per-step ops inside a while loop far worse than one wide op. Epoch
batch streams are built OUTSIDE the step scan (segmented to bound memory)
and fed through scan's ``xs`` slicing, which is free. This cut the bench
train step from 2.95 ms to the loss/grad/optimizer core.

Enabled by ``device_side_sampling: True`` for phases with uniform negative
sampling and no host augment hook. Negative-sampling parity note: rejection
runs a fixed ``R=16`` rounds (XLA needs static control flow); the probability
that a drawn negative is a false negative is ``p_coll^16`` — negligible except
for degenerate users who interacted with nearly the whole candidate set
(the host sampler's exact-complement fallback covers those in the host path;
see `recbole_cdr/sampler/crossdomain_sampler.py:139-175` for the reference's
unbounded loop).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recbole_cdr_tpu.utils.enums import InputType, TrainMode

R_ROUNDS = 16

#: per-epoch batch-stream memory budget; epochs whose streams exceed it are
#: built and consumed in segments (full segments via an outer scan + one
#: remainder program), keeping xs HBM bounded at any dataset size
SEGMENT_BYTES = 256 << 20

#: swap-or-not shuffle rounds. log2(n) rounds suffice statistically for
#: shuffle quality (the crypto bound is ~6*log2 n against adaptive
#: distinguishers, far stronger than epoch-order decorrelation needs);
#: 64 covers n up to the billions with margin and costs pure VPU arithmetic
SHUFFLE_ROUNDS = 64


def _shuffle_keys(rng, n: int, shape=()):
    """Per-permutation key material for :func:`_swap_or_not`:
    (keys int32 in [0, n), salts uint32), each shaped shape + [ROUNDS]."""
    k1, k2 = jax.random.split(rng)
    keys = jax.random.randint(
        k1, shape + (SHUFFLE_ROUNDS,), 0, max(n, 1), dtype=jnp.int32
    )
    salts = jax.random.bits(k2, shape + (SHUFFLE_ROUNDS,), dtype=jnp.uint32)
    return keys, salts


def _swap_or_not(x, n: int, keys, salts):
    """Keyed bijection on [0, n) — the Hoang–Morris–Rogaway swap-or-not
    shuffle: round r pairs x with partner = (K_r - x) mod n and swaps iff a
    hash bit of the pair's canonical member (the max) fires; each round is an
    involution of disjoint transpositions, so the composition is an exact
    permutation for ANY n (no pow2 domain, no cycle-walking).

    This replaces ``jax.random.permutation`` + a gather from the
    materialized permutation with pure per-slot VPU arithmetic: the key-sort
    cost ~4.5 ms/epoch at bench scale (results/step_breakdown.md) and the
    BOTH-phase per-cycle permutations no longer materialize [n_cycles, n]
    at all. keys/salts carry a trailing ROUNDS axis and may broadcast
    against x (e.g. per-cycle keys [n_steps, 1, ROUNDS])."""
    if n <= 1:
        return jnp.zeros_like(x)
    for r in range(SHUFFLE_ROUNDS):
        partner = keys[..., r] - x
        partner = jnp.where(partner < 0, partner + n, partner)
        m = jnp.maximum(x, partner).astype(jnp.uint32) ^ salts[..., r]
        m ^= m >> 16
        m *= jnp.uint32(0x85EBCA6B)
        m ^= m >> 13
        m *= jnp.uint32(0xC2B2AE35)
        m ^= m >> 16
        x = jnp.where((m & 1).astype(bool), partner, x)
    return x


#: width cap for the device membership matrix [num_users, H]. Real tails
#: (Amazon/Douban users with 10^4+ interactions — the reference holds them as
#: python sets, `crossdomain_sampler.py:229-250`) would otherwise multiply
#: the matrix by the HEAVIEST user's degree. Users past the cap ("heavy")
#: are excluded from rejection sampling entirely: their negatives draw
#: uniformly from a precomputed exact complement list (the device analogue
#: of the host sampler's exact-complement fallback, sampler/sampler.py) —
#: false-negative-free at any degree.
HIST_WIDTH_CAP = 2048


def _device_hist(used, num_users: int, cap: int = None):
    """Padded per-user history matrix [U, H] from a sampler's UsedIds,
    H <= ``cap``. Padding uses the sentinel ``num_items`` (never equals a
    candidate id). Returns (hist, heavy_uids) — heavy users' rows hold only
    their first ``cap`` items and MUST be overridden by the complement path.

    NOTE (measured on v5e): a brute-force dense compare against these rows is
    the fastest membership test — per-row binary search (~5x slower) and
    Bloom-filter probes (~2x slower) both lose to the VPU because their
    dynamic per-element gathers lower poorly on TPU."""
    cap = HIST_WIDTH_CAP if cap is None else cap
    keys = used.keys
    uids = (keys // used.num_items).astype(np.int64)
    iids = (keys % used.num_items).astype(np.int64)
    counts = np.bincount(uids, minlength=num_users)
    full_H = max(int(counts.max()) if len(counts) else 1, 1)
    H = min(full_H, cap)
    heavy_uids = np.flatnonzero(counts > cap)
    hist = np.full((num_users, H), used.num_items, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    pos_in = np.arange(len(uids)) - starts[uids]
    keep = pos_in < H
    hist[uids[keep], pos_in[keep]] = iids[keep]
    return hist, heavy_uids


#: budget (int32 elements) for the materialized heavy-user complement lists.
#: DomainDeviceData raises the width cap until the worst-case complement
#: total fits — many marginally-heavy users each cost ~n_candidates, so
#: widening the membership matrix (which costs num_users * cap) is the
#: cheaper trade until only the true tail remains.
COMPLEMENT_BUDGET = 64 << 20


def _heavy_complements(used, heavy_uids, candidate_ids, num_users: int):
    """Exact per-heavy-user complement lists for uniform negative sampling:
    (heavy_idx [num_users] int32 — -1 for light users, else the user's slot;
    offsets [n_heavy+1]; lens [n_heavy]; concat [sum]) where
    ``concat[offsets[i] : offsets[i] + lens[i]]`` are the candidate ids user
    ``heavy_uids[i]`` has NOT interacted with. A degenerate user who covered
    every candidate gets a 1-slot list (the reference's rejection loop would
    never terminate for them, `crossdomain_sampler.py:139-175`).

    O((E + n_heavy * n_cand) log) total: ``used.keys`` sort + per-user
    searchsorted slices — never a per-user scan of all interactions."""
    keys = np.sort(used.keys)  # sorted by (uid, iid): per-user runs contiguous
    uids = (keys // used.num_items).astype(np.int64)
    iids = (keys % used.num_items).astype(np.int64)
    heavy_idx = np.full(num_users, -1, np.int32)
    heavy_idx[heavy_uids] = np.arange(len(heavy_uids), dtype=np.int32)
    comps = []
    for u in heavy_uids:
        lo = np.searchsorted(uids, u)
        hi = np.searchsorted(uids, u + 1)
        comp = np.setdiff1d(candidate_ids, iids[lo:hi])
        if len(comp) == 0:
            comp = candidate_ids[:1]
        comps.append(comp.astype(np.int32))
    lens = np.array([len(c) for c in comps], np.int32)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    concat = (
        np.concatenate(comps).astype(np.int32) if comps
        else np.zeros(1, np.int32)
    )
    return heavy_idx, offsets, lens, concat


_HIST_CHUNK = 32


def _contiguous_ranges(ids: np.ndarray, max_ranges: int = 4):
    """Describe an id array as a tuple of (start, length) runs, or None if it
    needs more than ``max_ranges``. The sectioned ID space (SURVEY §2.4)
    makes every candidate list at most two runs (overlap prefix ++
    domain-only suffix), which lets the sampler map uniform draws to ids
    with pure arithmetic instead of a table gather — the gather was the
    single hottest op in the epoch program (~9 ms/epoch per domain at bench
    scale, device trace)."""
    ids = np.asarray(ids)
    if len(ids) == 0:
        return ((0, 0),)
    breaks = np.flatnonzero(np.diff(ids) != 1)
    if len(breaks) + 1 > max_ranges:
        return None
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks + 1, [len(ids)]])
    return tuple((int(ids[s]), int(e - s)) for s, e in zip(starts, ends))


def _ranges_to_ids(r, ranges):
    """Map uniform ranks r in [0, sum(lengths)) to candidate ids (static
    ranges -> pure arithmetic, no gather)."""
    if len(ranges) == 1:
        return jnp.int32(ranges[0][0]) + r
    out = jnp.zeros_like(r)
    lo = 0
    for start, length in ranges:
        sel = (r >= lo) & (r < lo + length)
        out = jnp.where(sel, jnp.int32(start - lo) + r, out)
        lo += length
    return out


def _sample_negatives(rng, uids, user_hist, candidate_ids, neg_num, rounds=None,
                      cand_ranges=None, alias=None, heavy=None):
    """[B * neg_num] negatives for uids ([B]): R batched draws, dense-compare
    rejection against the user's history row, first clean draw wins.
    ``rounds`` overrides the module default R_ROUNDS (must be static — it
    shapes the compare tensor); benchmarks pass it explicitly instead of
    mutating the module global (which jit's lazy tracing would ignore).

    Loop structure is HBM-traffic-driven: the history buffer ([total, H],
    ~20MB at production batch sizes) is the dominant operand, so it is read
    ONCE — a ``lax.scan`` walks it in [total, _HIST_CHUNK] slices and each
    slice is compared against ALL R candidate rounds in one broadcast,
    accumulating a per-round collision bitmap. (The previous scan-over-rounds
    re-read the full history every round: 16x the traffic, measured 1.13ms of
    a 2.6ms step at B=8k, H=400 on a v5e. The single-shot [R, total, H]
    broadcast is no better — it spills VMEM once total*H*R exceeds ~100M,
    measured 46ms/step.)

    candidate_ids: device array of legal item ids (never 0/PAD)."""
    R = R_ROUNDS if rounds is None else int(rounds)
    B = uids.shape[0]
    total = B * neg_num
    hist = user_hist[jnp.tile(uids, neg_num)]             # [total, H]
    if alias is not None:
        n_cand = alias[0].shape[0]
    elif cand_ranges is not None:
        n_cand = sum(l for _, l in cand_ranges)
    else:
        n_cand = candidate_ids.shape[0]

    # ONE threefry draw per slot; the R rounds come from a murmur3-finalizer
    # remix of (base + round * golden) on the VPU. R independent
    # jax.random.randint draws cost 0.85 ms/step at bench scale (threefry is
    # the single most expensive op in the step, measured on v5e); the remix
    # is ~free and each round stays uniform and pairwise-decorrelated.
    # Modulo bias over n_cand << 2^32 is O(n_cand / 2^32) — negligible.
    base = jax.random.bits(rng, (total,), dtype=jnp.uint32)
    round_ids = jnp.arange(R, dtype=jnp.uint32)[:, None]
    x = base[None, :] + round_ids * jnp.uint32(0x9E3779B9)
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    ranks = (x % jnp.uint32(n_cand)).astype(jnp.int32)    # [R, total]
    if alias is not None:
        # popularity sampling via the alias method (reference
        # `crossdomain_sampler.py:66-114`): draw a column uniformly, accept
        # with prob[col] else take alias[col]. The accept stream comes from a
        # SECOND independent base draw (same remix, different threefry key).
        values, prob, alias_idx = alias
        base2 = jax.random.bits(
            jax.random.fold_in(rng, 1), (total,), dtype=jnp.uint32
        )
        y = base2[None, :] + round_ids * jnp.uint32(0x9E3779B9)
        y ^= y >> 16
        y *= jnp.uint32(0x85EBCA6B)
        y ^= y >> 13
        y *= jnp.uint32(0xC2B2AE35)
        y ^= y >> 16
        u01 = (y >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)
        accept = u01 < prob[ranks]
        ali = alias_idx[ranks]
        chosen = jnp.where(accept | (ali < 0), ranks, ali)
        cand = values[chosen]
    elif cand_ranges is not None:
        cand = _ranges_to_ids(ranks, cand_ranges)         # arithmetic, no gather
    else:
        cand = candidate_ids[ranks]

    H = hist.shape[1]
    n_chunks = -(-H // _HIST_CHUNK)
    if n_chunks * _HIST_CHUNK != H:
        # pad with -1: candidate ids are >= 1, so padding never collides
        hist = jnp.pad(
            hist, ((0, 0), (0, n_chunks * _HIST_CHUNK - H)), constant_values=-1
        )

    # Layout: every compare operand keeps ``total`` as the minor (lane) dim —
    # one [total, H] -> [H, total] relayout up front, then [R, CH, total] and
    # [R, 1, total] broadcast with no per-iteration transposes. The previous
    # [R, total, CH] form made XLA relayout cand/chunk every scan step:
    # 1.24 ms/step of a 2.86 ms step at bench scale; this form is ~0.2 ms
    # (measured on v5e).
    hist_t = hist.T                                       # [H, total]

    def body(coll, c):
        chunk = jax.lax.dynamic_slice_in_dim(
            hist_t, c * _HIST_CHUNK, _HIST_CHUNK, axis=0
        )                                                 # [CH, total]
        hit = jnp.any(chunk[None] == cand[:, None, :], axis=1)  # [R, total]
        return coll | hit, 0.0

    coll, _ = jax.lax.scan(
        body, jnp.zeros((R, total), bool), jnp.arange(n_chunks)
    )

    # first clean round wins; pathological users (history covers nearly the
    # whole candidate set) fall back to the last draw when no round is clean
    clean = ~coll
    first = jnp.argmax(clean, axis=0)                     # [total]
    idx = jnp.where(jnp.any(clean, axis=0), first, R - 1)
    neg = jnp.take_along_axis(cand, idx[None], axis=0)[0]

    if heavy is not None:
        # heavy-tail users (degree > HIST_WIDTH_CAP): their hist rows are
        # truncated, so the rejection result is overridden by a uniform draw
        # from the user's exact complement list — false-negative-free at any
        # degree (the device analogue of the host sampler's exact-complement
        # fallback)
        heavy_idx, offs, lens, concat = heavy
        h = heavy_idx[jnp.tile(uids, neg_num)]            # [total]
        is_h = h >= 0
        hs = jnp.where(is_h, h, 0)
        L = jnp.maximum(lens[hs], 1)
        rbits = jax.random.bits(
            jax.random.fold_in(rng, 2), (total,), dtype=jnp.uint32
        )
        r = (rbits % L.astype(jnp.uint32)).astype(jnp.int32)
        neg = jnp.where(is_h, concat[offs[hs] + r], neg)
    return neg


class DomainDeviceData:
    """One domain's device-resident training data.

    ``put`` controls placement: single-device default, or replicated over a
    mesh (the interaction arrays/history are read-only operands every device
    needs; the per-step *batch* is what shards over 'data')."""

    def __init__(self, table, sampler, num_users: int, put=jnp.asarray):
        self.uid = put(np.asarray(table[table.uid_field], np.int32))
        self.iid = put(np.asarray(table[table.iid_field], np.int32))
        self.n = len(table)
        self.uid_field = table.uid_field
        self.iid_field = table.iid_field
        self.label_field = table.label_field
        self.neg_iid_field = table.neg_prefix + table.iid_field
        self.weight_field = table.uid_field.split("_", 1)[0] + "_sample_weight"
        dist = getattr(sampler, "distribution", "uniform")
        # popularity sampling has no complement-uniform equivalent, so its
        # membership matrix stays full-width (rejection must see every item)
        if dist == "popularity":
            cap = 1 << 30
        else:
            # raise the cap until the worst-case complement total fits the
            # budget: each heavy user can cost up to n_cand complement slots,
            # so a dataset with MANY moderately-heavy users widens the
            # matrix instead of materializing gigabytes of complements
            n_cand = len(sampler.candidate_ids)
            counts = np.bincount(
                (sampler.used.keys // sampler.used.num_items).astype(np.int64),
                minlength=num_users,
            )
            max_deg = int(counts.max()) if len(counts) else 0
            cap = HIST_WIDTH_CAP
            while (cap < max_deg
                   and int((counts > cap).sum()) * n_cand > COMPLEMENT_BUDGET):
                cap *= 2
        hist_np, heavy_uids = _device_hist(sampler.used, num_users, cap)
        self.hist = put(hist_np)
        self.heavy = None
        if len(heavy_uids):
            hidx, offs, lens, concat = _heavy_complements(
                sampler.used, heavy_uids,
                np.asarray(sampler.candidate_ids), num_users,
            )
            self.heavy = (put(hidx), put(offs), put(lens), put(concat))
        self.candidates = put(np.asarray(sampler.candidate_ids, np.int32))
        # static run-descriptor of the candidate list (None -> gather path);
        # identical id mapping when the list is ascending, which the
        # sectioned ID space guarantees
        self.cand_ranges = _contiguous_ranges(sampler.candidate_ids)
        # popularity distribution: the sampler's alias table moves to device
        # (values/prob/alias arrays; 3 small gathers per draw round)
        self.alias = None
        if getattr(sampler, "distribution", "uniform") == "popularity":
            at = sampler._alias
            self.alias = (
                put(np.asarray(at.values, np.int32)),
                put(np.asarray(at.prob, np.float32)),
                put(np.asarray(at.alias, np.int32)),
            )


class DeviceEpochLoop:
    """One jitted program per (phase) running a whole epoch of train steps.

    With ``mesh``, the same single program runs SPMD: parameters keep the
    shardings they arrive with (vocab-sharded tables over 'model'), the
    read-only interaction/history operands are replicated, and every
    assembled batch stream is constrained to shard its example axis over
    'data' — XLA inserts the gradient psum and table all-gathers over ICI."""

    def __init__(self, scheme: TrainMode, loss_fn, tx, train_data, input_type,
                 neg_num: int, num_users: int, base_rng, mesh=None,
                 donate: bool = True, sparse=None):
        self.scheme = scheme
        self.tx = tx
        self.sparse = sparse  # (spec, SparseAdam, trainable-mask) or None
        donate_args = (0, 1) if donate else ()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from recbole_cdr_tpu.parallel.distributed import put_replicated

            put = lambda x: put_replicated(x, mesh)  # multi-host safe
            stream_sh = NamedSharding(mesh, P(None, "data"))
            constrain = lambda x: jax.lax.with_sharding_constraint(x, stream_sh)
        else:
            put = jnp.asarray
            constrain = lambda x: x
        self._constrain = constrain
        src_b = train_data.source_batcher
        tgt_b = train_data.target_batcher
        self.src = DomainDeviceData(src_b.table, src_b.sampler, num_users, put)
        self.tgt = DomainDeviceData(tgt_b.table, tgt_b.sampler, num_users, put)
        self.overlap_ids = put(np.asarray(train_data.overlap_batcher.overlap.ids, np.int32))
        self.overlap_step = train_data.overlap_batcher.step

        if scheme == TrainMode.BOTH:
            self.step = tgt_b.step
            self.src_step = src_b.step
            self.steps_per_epoch = len(tgt_b)
            # source cycles per epoch: each cycle gets its OWN permutation
            # (matching the host path's reshuffle-on-exhaustion,
            # `data/batching.py:187-189`, and the reference's reset on
            # StopIteration, `dataloader.py:156-159`)
            self.src_batches_per_cycle = max(1, -(-self.src.n // self.src_step))
            self.src_cycles = max(
                1, -(-self.steps_per_epoch // self.src_batches_per_cycle)
            )
        elif scheme == TrainMode.SOURCE:
            self.step = src_b.step
            self.steps_per_epoch = len(src_b)
        elif scheme == TrainMode.TARGET:
            self.step = tgt_b.step
            self.steps_per_epoch = len(tgt_b)
        else:  # OVERLAP
            self.step = self.overlap_step
            self.steps_per_epoch = max(
                1, -(-len(train_data.overlap_batcher.overlap) // self.overlap_step)
            )

        scheme_t = scheme
        input_type_t = input_type
        src, tgt = self.src, self.tgt
        step = self.step
        n_over = len(train_data.overlap_batcher.overlap)
        pointwise = input_type_t == InputType.POINTWISE

        # ---- segment sizing: bound the per-epoch xs streams in HBM --------
        ex_per_step = 0
        if scheme_t in (TrainMode.BOTH, TrainMode.TARGET):
            ex_per_step += step * ((1 + neg_num) if pointwise else 1)
        if scheme_t == TrainMode.BOTH:
            ex_per_step += self.src_step * ((1 + neg_num) if pointwise else 1)
        elif scheme_t == TrainMode.SOURCE:
            ex_per_step += step * ((1 + neg_num) if pointwise else 1)
        elif scheme_t == TrainMode.OVERLAP:
            ex_per_step += step
        bytes_per_step = max(ex_per_step, 1) * 4 * 4  # ~4 int/float arrays
        self.seg_steps = max(
            1, min(self.steps_per_epoch, SEGMENT_BYTES // bytes_per_step)
        )
        self.n_full_segs = self.steps_per_epoch // self.seg_steps
        self.rem_steps = self.steps_per_epoch - self.n_full_segs * self.seg_steps

        # ---- epoch stream builders ----------------------------------------

        # NOTE: every large device buffer (uid/iid streams, history matrix,
        # candidate lists, overlap ids) is threaded through the jitted epoch
        # program as an ARGUMENT (the ``bufs`` pytree), never a closure.
        # Closed-over device arrays become embedded constants that get
        # re-materialized through the host<->chip tunnel on EVERY dispatch —
        # measured 1.9 ms/call for the 67MB history buffer vs 0.036 ms as an
        # argument (tools/_scan_probe history).

        def domain_stream(data, arrs, shuf, step_lo, n_steps, dstep, rng, cycle):
            """Bulk [n_steps, dstep] uid/iid/weight + [neg, n_steps, dstep]
            negatives for steps [step_lo, step_lo + n_steps). ``shuf`` is the
            (keys, salts) material of this epoch's swap-or-not permutation
            ([n_cycles, ROUNDS] when ``cycle``: a fresh permutation per
            source cycle, never materialized)."""
            keys, salts = shuf
            s = step_lo + jnp.arange(n_steps)
            if cycle:
                c = s // self.src_batches_per_cycle
                local = s % self.src_batches_per_cycle
                slots = local[:, None] * dstep + jnp.arange(dstep)[None, :]
                valid = slots < data.n
                rows = _swap_or_not(
                    jnp.where(valid, slots, 0), data.n,
                    keys[c][:, None, :], salts[c][:, None, :],
                )
            else:
                slots = s[:, None] * dstep + jnp.arange(dstep)[None, :]
                valid = slots < data.n
                rows = _swap_or_not(
                    jnp.where(valid, slots, 0) % max(data.n, 1), data.n,
                    keys, salts,
                )
            uid = constrain(arrs["uid"][rows])            # [n_steps, dstep]
            iid = constrain(arrs["iid"][rows])
            weight = valid.astype(jnp.float32)
            if neg_num > 0:
                neg = _sample_negatives(
                    rng, uid.reshape(-1), arrs["hist"], arrs["cand"], neg_num,
                    cand_ranges=data.cand_ranges, alias=arrs.get("alias"),
                    heavy=arrs.get("heavy"),
                ).reshape(neg_num, n_steps, dstep)
            else:
                neg = jnp.zeros((0, n_steps, dstep), jnp.int32)
            return uid, iid, weight, neg

        def domain_xs(data, uid, iid, weight, neg):
            """Per-step batch arrays in the exact layout TrainBatcher
            produces (`data/batching.py`), stacked over steps."""
            n_steps, dstep = uid.shape
            if pointwise:
                negf = jnp.moveaxis(neg, 0, 1).reshape(n_steps, neg_num * dstep)
                return {
                    data.uid_field: jnp.concatenate([uid] * (1 + neg_num), axis=1),
                    data.iid_field: jnp.concatenate([iid, negf], axis=1),
                    data.weight_field: jnp.concatenate([weight] * (1 + neg_num), axis=1),
                }
            out = {
                data.uid_field: uid,
                data.iid_field: iid,
                data.weight_field: weight,
            }
            if neg_num > 0:
                out[data.neg_iid_field] = jnp.moveaxis(neg, 0, 1).reshape(
                    n_steps, neg_num * dstep
                )
            return out

        def build_xs(bufs, shuf_src, shuf_tgt, shuf_over, rng, step_lo, n_steps):
            r_src, r_tgt = jax.random.split(jax.random.fold_in(rng, step_lo))
            xs = {}
            if scheme_t == TrainMode.BOTH:
                xs.update(domain_xs(src, *domain_stream(
                    src, bufs["src"], shuf_src, step_lo, n_steps, self.src_step,
                    r_src, True)))
                xs.update(domain_xs(tgt, *domain_stream(
                    tgt, bufs["tgt"], shuf_tgt, step_lo, n_steps, step, r_tgt,
                    False)))
            elif scheme_t == TrainMode.SOURCE:
                xs.update(domain_xs(src, *domain_stream(
                    src, bufs["src"], shuf_src, step_lo, n_steps, step, r_src,
                    False)))
            elif scheme_t == TrainMode.TARGET:
                xs.update(domain_xs(tgt, *domain_stream(
                    tgt, bufs["tgt"], shuf_tgt, step_lo, n_steps, step, r_tgt,
                    False)))
            else:  # OVERLAP: shuffled overlapped-entity id batches
                s = step_lo + jnp.arange(n_steps)
                slots = s[:, None] * self.overlap_step + jnp.arange(self.overlap_step)[None, :]
                valid = slots < n_over
                keys_o, salts_o = shuf_over
                ids = bufs["overlap_ids"][_swap_or_not(
                    jnp.where(valid, slots, 0) % max(n_over, 1), max(n_over, 1),
                    keys_o, salts_o,
                )]
                xs["overlap"] = constrain(ids)
                xs["overlap_sample_weight"] = valid.astype(jnp.float32)
            xs["__step__"] = step_lo + jnp.arange(n_steps)
            return xs

        def finish_batch(batch):
            """Add the static per-step pieces (pointwise 0/1 labels)."""
            if pointwise and scheme_t != TrainMode.OVERLAP:
                for data in ((src, tgt) if scheme_t == TrainMode.BOTH
                             else (src,) if scheme_t == TrainMode.SOURCE else (tgt,)):
                    dstep = batch[data.uid_field].shape[0] // (1 + neg_num)
                    label = jnp.zeros(dstep * (1 + neg_num), jnp.float32).at[:dstep].set(1.0)
                    batch[data.label_field] = label
            return batch

        sparse_t = sparse

        def make_step_body(rng):
            if sparse_t is None:
                def body(carry, xs):
                    params, opt_state = carry
                    step_idx = xs.pop("__step__")
                    batch = finish_batch(xs)
                    r_loss = jax.random.fold_in(rng, step_idx)
                    loss, grads = jax.value_and_grad(
                        lambda p: loss_fn(p, batch, r_loss)
                    )(params)
                    updates, opt_state = self.tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss
                return body

            # ---- row-sparse step (trainer.SparseAdam + model.sparse_spec) --
            # The loss is re-based onto the GATHERED rows of each spec'd
            # table: every occurrence of a batch id becomes its own row of a
            # [R, D] sub-table and the batch's id fields are remapped to
            # positions 0..R-1 (pure arithmetic). loss_fn runs unchanged on
            # the patched tree, so grads arrive per-occurrence [R, D] — the
            # dense [N, D] grad (and the full-table Adam moment traffic, the
            # HBM-bound bulk of the dense step) never materializes. Duplicate
            # ids are coalesced inside SparseAdam.row_update exactly like
            # torch's sparse-grad coalesce().
            spec, opt, mask = sparse_t

            def body(carry, xs):
                params, opt_state = carry
                step_idx = xs.pop("__step__")
                batch = finish_batch(xs)
                r_loss = jax.random.fold_in(rng, step_idx)

                batch2 = dict(batch)
                idx = {}
                key_offset = {}
                for name, keys in spec.items():
                    parts, off = [], 0
                    for k in keys:
                        a = batch[k].reshape(-1).astype(jnp.int32)
                        # a batch key indexing MULTIPLE spec'd tables (e.g.
                        # EMCDR OVERLAP's "overlap" into both sides) is only
                        # valid when its remapped positions coincide across
                        # them — i.e. same offset within each table's concat
                        if k in key_offset:
                            if key_offset[k] != off:
                                raise ValueError(
                                    f"sparse_spec: batch key {k!r} sits at "
                                    f"offsets {key_offset[k]} and {off} in "
                                    "different tables' index concats — "
                                    "reorder the spec so shared keys align"
                                )
                        else:
                            key_offset[k] = off
                        batch2[k] = (
                            off + jnp.arange(a.shape[0], dtype=batch[k].dtype)
                        ).reshape(batch[k].shape)
                        parts.append(a)
                        off += a.shape[0]
                    idx[name] = (
                        jnp.concatenate(parts) if len(parts) > 1 else parts[0]
                    )
                sub = {n: jnp.take(params[n], i, axis=0) for n, i in idx.items()}
                dense = {k: v for k, v in params.items() if k not in spec}

                def loss_sub(sub_t, dense_t):
                    return loss_fn({**dense_t, **sub_t}, batch2, r_loss)

                loss, (g_sub, g_dense) = jax.value_and_grad(
                    loss_sub, argnums=(0, 1)
                )(sub, dense)

                new_params = dict(params)
                mu = dict(opt_state["mu"])
                nu = dict(opt_state["nu"])
                cnt = dict(opt_state["count"])
                for name in spec:
                    c = cnt[name] + 1
                    new_params[name], mu[name], nu[name] = opt.row_update(
                        params[name], mu[name], nu[name],
                        g_sub[name], idx[name], c,
                    )
                    cnt[name] = c
                for name in dense:
                    if not mask.get(name, True):
                        continue
                    c = cnt[name] + 1
                    upd, mu[name], nu[name] = opt.dense_entry_update(
                        g_dense[name], mu[name], nu[name], c
                    )
                    new_params[name] = optax.apply_updates(params[name], upd)
                    cnt[name] = c
                return (new_params, {"mu": mu, "nu": nu, "count": cnt}), loss

            return body

        self._buffers = {
            "src": {"uid": src.uid, "iid": src.iid, "hist": src.hist,
                    "cand": src.candidates},
            "tgt": {"uid": tgt.uid, "iid": tgt.iid, "hist": tgt.hist,
                    "cand": tgt.candidates},
            "overlap_ids": self.overlap_ids,
        }
        for dom, data in (("src", src), ("tgt", tgt)):
            if data.alias is not None:
                self._buffers[dom]["alias"] = data.alias
            if data.heavy is not None:
                self._buffers[dom]["heavy"] = data.heavy

        def run_one_epoch(params, opt_state, rng, bufs):
            # epoch shuffles are keyed swap-or-not bijections evaluated
            # per-slot in the stream builders — nothing is sorted or
            # materialized (the host-side np.random.permutation + upload this
            # replaced cost ~33ms/epoch through the chip tunnel; the previous
            # on-device jax.random.permutation key-sorts, ~4.5 ms/epoch at
            # bench scale per results/step_breakdown.md)
            r_s, r_t, r_o = jax.random.split(jax.random.fold_in(rng, 0xC0FFEE), 3)
            if scheme_t == TrainMode.BOTH:
                # fresh key material PER source cycle: [n_cycles, ROUNDS]
                shuf_src = _shuffle_keys(r_s, src.n, (self.src_cycles,))
            else:
                shuf_src = _shuffle_keys(r_s, src.n)
            shuf_tgt = _shuffle_keys(r_t, tgt.n)
            shuf_over = _shuffle_keys(r_o, n_over)
            r_neg = jax.random.fold_in(rng, 0x5EED)
            body = make_step_body(rng)

            def run_segment(params, opt_state, step_lo, n_steps):
                xs = build_xs(bufs, shuf_src, shuf_tgt, shuf_over, r_neg,
                              step_lo, n_steps)
                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), xs
                )
                return params, opt_state, jnp.sum(losses)

            total = jnp.float32(0.0)
            if self.n_full_segs == 1 and self.rem_steps == 0:
                params, opt_state, total = run_segment(params, opt_state, 0, self.seg_steps)
            else:
                if self.n_full_segs:
                    def seg_body(carry, seg_i):
                        p, o, acc = carry
                        p, o, ls = run_segment(p, o, seg_i * self.seg_steps, self.seg_steps)
                        return (p, o, acc + ls), 0.0
                    (params, opt_state, total), _ = jax.lax.scan(
                        seg_body, (params, opt_state, total),
                        jnp.arange(self.n_full_segs),
                    )
                if self.rem_steps:
                    params, opt_state, ls = run_segment(
                        params, opt_state, self.n_full_segs * self.seg_steps,
                        self.rem_steps,
                    )
                    total = total + ls
            return params, opt_state, total

        @partial(jax.jit, donate_argnums=donate_args)
        def epoch_fn(params, opt_state, rng, bufs):
            return run_one_epoch(params, opt_state, rng, bufs)

        base_rng_dev = base_rng

        @partial(jax.jit, donate_argnums=donate_args, static_argnums=(3,))
        def epochs_fn(params, opt_state, epoch0, n_epochs, bufs):
            """n_epochs full epochs in ONE dispatch (used between validation
            points, i.e. chunks of eval_step): per-epoch RNG folding happens
            on device, so the stream matches n_epochs x epoch_fn exactly."""

            def body(carry, e):
                params, opt_state = carry
                rng = jax.random.fold_in(base_rng_dev, epoch0 + e)
                params, opt_state, loss = run_one_epoch(params, opt_state, rng, bufs)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n_epochs)
            )
            return params, opt_state, losses

        self._epoch_fn = epoch_fn
        self._epochs_fn = epochs_fn
        self._base_rng = base_rng

    def run_epoch(self, params, opt_state, epoch_idx):
        """Host cost: one scalar fold_in + one dispatch."""
        rng = jax.random.fold_in(self._base_rng, epoch_idx)
        return self._epoch_fn(params, opt_state, rng, self._buffers)

    def run_epochs(self, params, opt_state, epoch0: int, n_epochs: int):
        """n_epochs epochs fused into one device call; returns per-epoch
        losses [n_epochs]. RNG-identical to n_epochs run_epoch calls."""
        return self._epochs_fn(params, opt_state, epoch0, n_epochs, self._buffers)
