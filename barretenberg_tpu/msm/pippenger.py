"""Pippenger multi-scalar multiplication on TPU, with GLV + signed windows.

Re-design of the reference's bucketed MSM (reference:
curves/bn254/scalar_multiplication.cpp:576-648 and the bucket-ordered
"alt_pippenger" design in src/barretenberg/pippenger.md) for a SIMD machine
with no scatter-accumulate:

  0. every scalar is GLV-split on device into two 128-bit halves
     (msm/wnaf.py; reference fields/field.hpp:413-485) and every point is
     paired with its endomorphism image (beta*x, -y) (the analog of
     generate_pippenger_point_table, scalar_multiplication.cpp:131-140);
     digits are signed c-bit windows, so a round has 2^(c-1) buckets and
     there are ceil(128/c)+1 rounds over 2N entries - ~2.4x less bucket work
     than unsigned 254-bit windows;
  per round (MSB-first):
    1. sort entry indices by bucket = |digit| - 1 (the radix-sort formulation
       of pippenger.md:47-66 - exactly the TPU/GPU-friendly variant), with
       per-entry conditional negation for digit < 0 (the cmov of
       group_impl_asm.tcc:71-104 as a lane select);
    2. accumulate equal-bucket runs with a *block-sequential segment scan*:
       sorted entries are reshaped to (blocks, C) and lax.scan walks the C
       columns, every block advancing in lockstep on the VPU lanes;
    3. runs that span block boundaries emit partial sums; the emitted
       partials are compacted by a key sort and merged with a Kogge-Stone
       segmented scan (log-depth, tiny);
    4. bucket sums -> window sum via the running-sum identity
       sum_m m*S_m = sum of suffix sums (reference's bucket concatenation,
       scalar_multiplication.cpp:628-640), computed with log-depth scans;
    5. windows combine MSB-first with c doublings per round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import fq, fr
from ..fields.params import LIMB_BITS, NUM_LIMBS
from ..groups import AffinePoints, JacobianPoints
from ..groups.g1 import g1
from .wnaf import signed_digits, split_scalars

SCALAR_BITS = 254


def scalar_digits(scalars_mont: jnp.ndarray, c: int) -> jnp.ndarray:
    """Internal-Montgomery Fr scalars (18, N) -> (rounds, N) uint32 c-bit
    unsigned window digits of the canonical integer value (used by the
    naive double-and-add oracle)."""
    value = fr.to_plain(scalars_mont)  # canonical 15-bit limbs of the value
    n = value.shape[1]
    limbs = jnp.concatenate([value, jnp.zeros((2, n), dtype=jnp.uint32)], axis=0)
    rounds = -(-SCALAR_BITS // c)
    out = []
    for r in range(rounds):
        lo = r * c
        l0, sh = lo // LIMB_BITS, lo % LIMB_BITS
        d = limbs[l0] >> sh
        got = LIMB_BITS - sh
        k = 1
        while got < c:
            d = d | (limbs[l0 + k] << got)
            got += LIMB_BITS
            k += 1
        out.append(d & jnp.uint32((1 << c) - 1))
    return jnp.stack(out)


def optimal_window(n: int) -> int:
    """Window width heuristic (the reference tunes widths 12/15/18 on x86,
    scalar_multiplication.cpp:21-81; TPU's sort-dominated rounds favor
    smaller tables)."""
    if n <= 1 << 12:
        return 8
    if n <= 1 << 16:
        return 10
    return 13


def _ks_segmented_scan(points: JacobianPoints, starts, n: int):
    """Kogge-Stone inclusive segmented scan of group adds along the batch
    axis. starts: bool (n,), True at segment starts. Returns scanned points."""
    levels = max(1, (n - 1).bit_length())

    def level(i, carry):
        pts, fl = carry
        d = jnp.int32(1) << i
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        valid = idx >= d
        sh_x = jnp.roll(pts.x, d, axis=1)
        sh_y = jnp.roll(pts.y, d, axis=1)
        sh_z = jnp.roll(pts.z, d, axis=1)
        sh_inf = jnp.roll(pts.inf, d, axis=0) | ~valid
        sh_fl = jnp.roll(fl, d, axis=0) & valid
        shifted = JacobianPoints(sh_x, sh_y, sh_z, sh_inf)
        summed = g1.add(pts, shifted)
        keep = fl | ~valid  # at segment start (or oob) keep own value
        new = g1.select_points(keep, pts, summed)
        return (new, fl | sh_fl)

    pts, _ = jax.lax.fori_loop(0, levels, level, (points, starts))
    return pts


def _suffix_scan_points(points: JacobianPoints, n: int) -> JacobianPoints:
    """Inclusive suffix scan (out[i] = sum_{j>=i} in[j]) of group adds."""
    levels = max(1, (n - 1).bit_length())

    def level(i, pts):
        d = jnp.int32(1) << i
        idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        valid = idx < (n - d)
        sh_x = jnp.roll(pts.x, -d, axis=1)
        sh_y = jnp.roll(pts.y, -d, axis=1)
        sh_z = jnp.roll(pts.z, -d, axis=1)
        sh_inf = jnp.roll(pts.inf, -d, axis=0) | ~valid
        return g1.add(pts, JacobianPoints(sh_x, sh_y, sh_z, sh_inf))

    return jax.lax.fori_loop(0, levels, level, points)


def _suffix_scan_points_seg(
    points: JacobianPoints, total: int, seg: int
) -> JacobianPoints:
    """Segmented inclusive suffix scan: the flat (total,) batch is treated
    as total//seg contiguous segments of length seg (a power of two), each
    suffix-scanned independently (out[i] = sum_{j>=i, same segment} in[j]).
    All segments advance in parallel on the VPU lanes."""
    levels = max(1, (seg - 1).bit_length())
    mask = jnp.uint32(seg - 1)

    def level(i, pts):
        d = jnp.int32(1) << i
        idx = jax.lax.broadcasted_iota(jnp.uint32, (total, 1), 0).squeeze(-1)
        valid = (idx & mask).astype(jnp.int32) < (seg - d)
        sh_x = jnp.roll(pts.x, -d, axis=1)
        sh_y = jnp.roll(pts.y, -d, axis=1)
        sh_z = jnp.roll(pts.z, -d, axis=1)
        sh_inf = jnp.roll(pts.inf, -d, axis=0) | ~valid
        return g1.add(pts, JacobianPoints(sh_x, sh_y, sh_z, sh_inf))

    return jax.lax.fori_loop(0, levels, level, points)


def _take_jacobian(p: JacobianPoints, idx) -> JacobianPoints:
    return JacobianPoints(
        jnp.take(p.x, idx, axis=1),
        jnp.take(p.y, idx, axis=1),
        jnp.take(p.z, idx, axis=1),
        jnp.take(p.inf, idx, axis=0),
    )


def _bucket_sums(
    bucket_idx, pts: AffinePoints, nbuckets: int, block: int
) -> JacobianPoints:
    """Segment-accumulate entries (sorted by bucket) into per-bucket sums.

    bucket_idx: (M,) uint32, == nbuckets for dead entries. pts: (M,) affine.
    M must be a multiple of block. Returns JacobianPoints batch (nbuckets,).
    """
    m_total = bucket_idx.shape[0]
    nblocks = m_total // block
    k_partials = min(nbuckets + nblocks, nblocks * (block + 1))

    order = jnp.argsort(bucket_idx)
    ds = jnp.take(bucket_idx, order)
    spts = g1.take_affine(pts, order)

    # ---- phase A: block-sequential segment accumulation -------------
    ds_cols = ds.reshape(nblocks, block).T  # (C, B)
    px = spts.x.reshape(NUM_LIMBS, nblocks, block).transpose(2, 0, 1)
    py = spts.y.reshape(NUM_LIMBS, nblocks, block).transpose(2, 0, 1)
    pinf = spts.inf.reshape(nblocks, block).T

    def col_step(carry, xs):
        acc_pt, cur_d = carry
        dj, xj, yj, infj = xs
        same = dj == cur_d
        aff = AffinePoints(xj, yj, infj)
        added = g1.mixed_add(acc_pt, aff)
        fresh = g1.to_jacobian(aff)
        new_acc = g1.select_points(same, added, fresh)
        emit = ~same
        out = (emit, cur_d, acc_pt)
        return (new_acc, dj), out

    init = (g1.infinity((nblocks,)), ds_cols[0])
    (final_acc, final_d), (em_f, em_d, em_p) = jax.lax.scan(
        col_step, init, (ds_cols, px, py, pinf)
    )
    # append final segment of each block
    em_f = jnp.concatenate([em_f, jnp.ones((1, nblocks), dtype=bool)])
    em_d = jnp.concatenate([em_d, final_d[None]])
    em_p = JacobianPoints(
        jnp.concatenate([em_p.x, final_acc.x[None]], axis=0),
        jnp.concatenate([em_p.y, final_acc.y[None]], axis=0),
        jnp.concatenate([em_p.z, final_acc.z[None]], axis=0),
        jnp.concatenate([em_p.inf, final_acc.inf[None]], axis=0),
    )
    # flatten block-major so digits stay globally sorted
    steps = block + 1
    em_f = em_f.T.reshape(nblocks * steps)
    em_d = em_d.T.reshape(nblocks * steps)
    em_p = JacobianPoints(
        em_p.x.transpose(1, 2, 0).reshape(NUM_LIMBS, nblocks * steps),
        em_p.y.transpose(1, 2, 0).reshape(NUM_LIMBS, nblocks * steps),
        em_p.z.transpose(1, 2, 0).reshape(NUM_LIMBS, nblocks * steps),
        em_p.inf.T.reshape(nblocks * steps),
    )

    # ---- compaction: emitted entries to the front, keep order -------
    pos = jax.lax.broadcasted_iota(jnp.uint32, (nblocks * steps, 1), 0).squeeze(-1)
    key = jnp.where(em_f, pos, jnp.uint32(1 << 30) | pos)
    corder = jnp.argsort(key)[:k_partials]
    cd = jnp.where(
        jnp.take(em_f, corder), jnp.take(em_d, corder), jnp.uint32(nbuckets)
    )
    cp = _take_jacobian(em_p, corder)
    cp = JacobianPoints(cp.x, cp.y, cp.z, cp.inf | (cd == nbuckets))

    # ---- phase B: merge equal-bucket partials (log depth) ------------
    prev_d = jnp.roll(cd, 1)
    starts = jnp.concatenate([jnp.ones((1,), dtype=bool), (cd != prev_d)[1:]])
    merged = _ks_segmented_scan(cp, starts, k_partials)
    next_d = jnp.roll(cd, -1)
    is_end = jnp.concatenate([(cd != next_d)[:-1], jnp.ones((1,), dtype=bool)])

    # ---- scatter bucket sums ------------------------------------------
    live = is_end & (cd < nbuckets)
    bidx = jnp.where(live, cd, jnp.uint32(nbuckets))
    binit = g1.infinity((nbuckets + 1,))
    buckets = JacobianPoints(
        binit.x.at[:, bidx].set(merged.x),
        binit.y.at[:, bidx].set(merged.y),
        binit.z.at[:, bidx].set(merged.z),
        binit.inf.at[bidx].set(merged.inf | ~live),
    )
    return _take_jacobian(buckets, jnp.arange(nbuckets))


def _accumulate_window(
    bucket_idx, pts: AffinePoints, nbuckets: int, block: int
) -> JacobianPoints:
    """One Pippenger round body: bucket sums -> window sum sum_m (m+1)*S_m
    via the double-suffix-scan identity."""
    buckets = _bucket_sums(bucket_idx, pts, nbuckets, block)
    suffix = _suffix_scan_points(buckets, nbuckets)
    return _take_jacobian(_suffix_scan_points(suffix, nbuckets), jnp.array([0]))


@functools.partial(jax.jit, static_argnames=("c", "block"))
def _pippenger_impl(
    scalars_mont: jnp.ndarray,
    points: AffinePoints,
    c: int,
    block: int,
) -> JacobianPoints:
    n = scalars_mont.shape[1]
    # GLV split + endo point table (scalar_multiplication.cpp:131-140):
    # k*P = k1*P + k2*(beta*x, -y)
    k1, k2 = split_scalars(scalars_mont)
    d1 = signed_digits(k1, c)  # (R, N) int32
    d2 = signed_digits(k2, c)
    digits = jnp.concatenate([d1, d2], axis=1)  # (R, 2N)
    beta_x = fq.mul_by_constant(points.x, fq.params.cube_root)
    px = jnp.concatenate([points.x, beta_x], axis=1)
    py = jnp.concatenate([points.y, fq.neg(points.y)], axis=1)
    pinf = jnp.concatenate([points.inf, points.inf], axis=0)
    neg_py = fq.neg(py)

    m_total = 2 * n
    npad = -(-m_total // block) * block
    pad = npad - m_total
    if pad:
        digits = jnp.pad(digits, ((0, 0), (0, pad)))
        px = jnp.pad(px, ((0, 0), (0, pad)))
        py = jnp.pad(py, ((0, 0), (0, pad)))
        neg_py = jnp.pad(neg_py, ((0, 0), (0, pad)))
        pinf = jnp.pad(pinf, (0, pad), constant_values=True)

    rounds = digits.shape[0]
    nbuckets = 1 << (c - 1)

    def round_fn(r, acc):
        d = digits[rounds - 1 - r]
        negate = d < 0
        mag = jnp.abs(d).astype(jnp.uint32)
        bucket = jnp.where(mag == 0, jnp.uint32(nbuckets), mag - 1)
        pts = AffinePoints(
            px, jnp.where(negate[None], neg_py, py), pinf | (mag == 0)
        )
        window = _accumulate_window(bucket, pts, nbuckets, block)
        # optimization_barrier: XLA:TPU miscompiles the fusion of the
        # window accumulation with the loop-carried doubling chain at
        # n >= 2^14 (observed on v5e: per-round windows correct standalone,
        # whole-loop result wrong; same defect class as the broadcast-mul
        # barrier in fields/montgomery.py:_materialize_broadcast)
        window, acc = jax.lax.optimization_barrier((window, acc))
        acc = jax.lax.fori_loop(0, c, lambda _, a: g1.dbl(a), acc)
        return g1.add(acc, window)

    return jax.lax.fori_loop(0, rounds, round_fn, g1.infinity((1,)))


@functools.partial(jax.jit, static_argnames=("c", "block"))
def _pippenger_fused_impl(
    scalars_mont: jnp.ndarray,
    points: AffinePoints,
    c: int,
    block: int,
) -> JacobianPoints:
    """Small-batch schedule: ALL rounds' windows in ONE sort+segment-scan.

    The per-round path (_pippenger_impl) serializes rounds because of the
    doubling accumulator, so at small N its wall time is dominated by
    sequential step count (R * (block scan + merge + suffix scans)), not by
    lane width - at 2^12 that is ~2700 dependent point ops for ~64-wide
    lanes. Here every (round, entry) pair becomes one entry of a single
    bucket space of rounds * 2^(c-1) buckets (bucket = round * nbuckets +
    digit - 1), so one segment scan accumulates every window at once; the
    per-round double-suffix-scan runs with rounds as a parallel batch
    (_suffix_scan_points_seg); only the final Horner combine (c doublings
    per window, the inherent 2^128-factor depth) stays sequential. The
    reference reaches the same end - constant bucket work per point - via
    its bucket-width table (scalar_multiplication.cpp:21-81); on TPU the
    win is sequential-depth reduction, ~2700 -> ~300 dependent ops.
    """
    n = scalars_mont.shape[1]
    k1, k2 = split_scalars(scalars_mont)
    d1 = signed_digits(k1, c)  # (R, N) int32
    d2 = signed_digits(k2, c)
    digits = jnp.concatenate([d1, d2], axis=1)  # (R, 2N)
    rounds = digits.shape[0]
    nbuckets = 1 << (c - 1)
    nb_total = rounds * nbuckets

    beta_x = fq.mul_by_constant(points.x, fq.params.cube_root)
    px = jnp.concatenate([points.x, beta_x], axis=1)  # (18, 2N)
    py = jnp.concatenate([points.y, fq.neg(points.y)], axis=1)
    pinf = jnp.concatenate([points.inf, points.inf], axis=0)
    neg_py = fq.neg(py)

    # round-major flattening: entry e = r * 2N + i carries digit[r, i] and
    # point i (tile repeats the 2N point block once per round)
    flat = digits.reshape(-1)  # (R * 2N,)
    px_full = jnp.tile(px, (1, rounds))
    py_full = jnp.tile(py, (1, rounds))
    negpy_full = jnp.tile(neg_py, (1, rounds))
    pinf_full = jnp.tile(pinf, (rounds,))

    two_n = 2 * n
    rid = jax.lax.broadcasted_iota(
        jnp.uint32, (rounds * two_n, 1), 0
    ).squeeze(-1) // jnp.uint32(two_n)
    negate = flat < 0
    mag = jnp.abs(flat).astype(jnp.uint32)
    bucket = jnp.where(
        mag == 0, jnp.uint32(nb_total), rid * jnp.uint32(nbuckets) + mag - 1
    )
    pts = AffinePoints(
        px_full,
        jnp.where(negate[None], negpy_full, py_full),
        pinf_full | (mag == 0),
    )

    m_total = rounds * two_n
    npad = -(-m_total // block) * block
    pad = npad - m_total
    if pad:
        bucket = jnp.pad(bucket, (0, pad), constant_values=nb_total)
        pts = AffinePoints(
            jnp.pad(pts.x, ((0, 0), (0, pad))),
            jnp.pad(pts.y, ((0, 0), (0, pad))),
            jnp.pad(pts.inf, (0, pad), constant_values=True),
        )

    buckets = _bucket_sums(bucket, pts, nb_total, block)
    # per-round window sums, rounds as a parallel batch
    suffix = _suffix_scan_points_seg(buckets, nb_total, nbuckets)
    dsum = _suffix_scan_points_seg(suffix, nb_total, nbuckets)
    windows = _take_jacobian(dsum, jnp.arange(rounds) * nbuckets)  # (R,)
    # same defect class as the per-round path: keep the window values out
    # of the doubling-chain fusion (see _pippenger_impl's barrier note)
    windows = jax.lax.optimization_barrier(windows)

    # Horner combine, MSB-first: acc = 2^c * acc + W_r. One fori_loop with
    # a dynamic window gather keeps exactly one dbl and one add instance in
    # the graph (a Python unroll compiled R copies of each - XLA flagged
    # the module as pathologically slow to build).
    def comb(r, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: g1.dbl(a), acc)
        idx = jnp.full((1,), rounds - 1, jnp.int32) - r
        return g1.add(acc, _take_jacobian(windows, idx))

    acc = _take_jacobian(windows, jnp.array([rounds - 1]))
    return jax.lax.fori_loop(1, rounds, comb, acc)


# fused-schedule cutover: above this N the per-round path's lane widths are
# large enough that its (smaller) memory footprint wins
FUSED_MAX_N = 1 << 15


def pippenger(
    scalars_mont: jnp.ndarray,
    points: AffinePoints,
    c: int | None = None,
    block: int = 128,
    fused: bool | None = None,
) -> JacobianPoints:
    """MSM: sum_i scalars[i] * points[i] -> JacobianPoints batch (1,).

    scalars_mont: (18, N) internal-Montgomery Fr values (matching the
    reference pippenger's from-Montgomery conversion on entry,
    scalar_multiplication.cpp:457-476). points: affine batch (N).
    """
    n = scalars_mont.shape[1]
    if c is None:
        c = optimal_window(n)
    block = min(block, max(16, 2 * n))
    if fused is None:
        fused = n <= FUSED_MAX_N
    if fused:
        return _pippenger_fused_impl(scalars_mont, points, c, block)
    return _pippenger_impl(scalars_mont, points, c, block)


class PippengerPointTable:
    """Per-round shifted point table for a fixed point set: table row r
    holds 2^(rc) * P_i (the analog of the reference's per-round tables in
    pippenger_precomputed, scalar_multiplication.cpp:478-573)."""

    def __init__(self, x, y, inf, c: int, rounds: int, n: int):
        self.x, self.y, self.inf = x, y, inf  # (18, rounds*n), (rounds*n,)
        self.c, self.rounds, self.n = c, rounds, n


def generate_pippenger_point_table(
    points: AffinePoints, c: int | None = None
) -> PippengerPointTable:
    """Builds the shifted tables with c doublings per round on device
    (scalar_multiplication.cpp:131-140's table generation, extended to the
    per-round form)."""
    from .wnaf import HALF_BITS

    n = points.x.shape[1]
    if c is None:
        c = optimal_window(n)
    rounds = -(-HALF_BITS // c) + 1
    xs, ys, infs = [points.x], [points.y], [points.inf]
    cur = g1.to_jacobian(points)

    @functools.partial(jax.jit, static_argnames=("k",))
    def dbl_k(p, k):
        return jax.lax.fori_loop(0, k, lambda _, q: g1.dbl(q), p)

    for _ in range(rounds - 1):
        cur = dbl_k(cur, c)
        aff = g1.batch_normalize_chunked(cur)
        xs.append(aff.x)
        ys.append(aff.y)
        infs.append(aff.inf)
    return PippengerPointTable(
        jnp.concatenate(xs, axis=1),
        jnp.concatenate(ys, axis=1),
        jnp.concatenate(infs, axis=0),
        c,
        rounds,
        n,
    )


@functools.partial(jax.jit, static_argnames=("c", "rounds", "n", "block"))
def _pippenger_precomputed_impl(
    scalars_mont, tx, ty, tinf, c: int, rounds: int, n: int, block: int
):
    # digits for both GLV halves: (R, 2N), laid out [d1 | d2] per round
    k1, k2 = split_scalars(scalars_mont)
    d1 = signed_digits(k1, c)
    d2 = signed_digits(k2, c)
    digits = jnp.concatenate([d1, d2], axis=1).reshape(-1)  # (R*2N,)

    # entry points: round r, first N = table row r, next N = endo images
    tx3 = tx.reshape(NUM_LIMBS, rounds, n)
    ty3 = ty.reshape(NUM_LIMBS, rounds, n)
    ti2 = tinf.reshape(rounds, n)
    beta_x = fq.mul_by_constant(tx3, fq.params.cube_root)
    px = jnp.concatenate([tx3, beta_x], axis=2).reshape(NUM_LIMBS, rounds * 2 * n)
    py_pos = jnp.concatenate([ty3, fq.neg(ty3)], axis=2).reshape(
        NUM_LIMBS, rounds * 2 * n
    )
    pinf = jnp.concatenate([ti2, ti2], axis=1).reshape(rounds * 2 * n)
    neg_py = fq.neg(py_pos)

    m_total = rounds * 2 * n
    npad = -(-m_total // block) * block
    pad = npad - m_total
    if pad:
        digits = jnp.pad(digits, (0, pad))
        px = jnp.pad(px, ((0, 0), (0, pad)))
        py_pos = jnp.pad(py_pos, ((0, 0), (0, pad)))
        neg_py = jnp.pad(neg_py, ((0, 0), (0, pad)))
        pinf = jnp.pad(pinf, (0, pad), constant_values=True)

    nbuckets = 1 << (c - 1)
    negate = digits < 0
    mag = jnp.abs(digits).astype(jnp.uint32)
    bucket = jnp.where(mag == 0, jnp.uint32(nbuckets), mag - 1)
    pts = AffinePoints(
        px, jnp.where(negate[None], neg_py, py_pos), pinf | (mag == 0)
    )
    # ONE bucket accumulation over every (round, point) entry: the shifted
    # tables absorb the 2^(rc) factors, so no doublings and no round loop.
    return _accumulate_window(bucket, pts, nbuckets, block)


def pippenger_precomputed(
    scalars_mont: jnp.ndarray, table: PippengerPointTable, block: int = 128
) -> JacobianPoints:
    """MSM against a precomputed table (scalar_multiplication.cpp:478-573):
    all rounds share one sort+segment-scan pass."""
    return _pippenger_precomputed_impl(
        scalars_mont,
        table.x,
        table.y,
        table.inf,
        table.c,
        table.rounds,
        table.n,
        block,
    )


def pippenger_low_memory(
    scalars_mont: jnp.ndarray,
    points: AffinePoints,
    chunk: int = 1 << 16,
    c: int | None = None,
) -> JacobianPoints:
    """Chunked MSM with bounded peak memory (the analog of the reference's
    pippenger_low_memory, scalar_multiplication.cpp:142-263): process the
    point set in fixed-size chunks with one compiled shape, tree-add the
    partial sums."""
    n = scalars_mont.shape[1]
    if n <= chunk:
        return pippenger(scalars_mont, points, c=c)
    if c is None:
        c = optimal_window(chunk)
    acc = None
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        s = scalars_mont[:, lo:hi]
        p = AffinePoints(points.x[:, lo:hi], points.y[:, lo:hi], points.inf[lo:hi])
        if hi - lo != chunk:
            pad = chunk - (hi - lo)
            s = jnp.pad(s, ((0, 0), (0, pad)))
            p = AffinePoints(
                jnp.pad(p.x, ((0, 0), (0, pad))),
                jnp.pad(p.y, ((0, 0), (0, pad))),
                jnp.pad(p.inf, (0, pad), constant_values=True),
            )
        part = _pippenger_impl(s, p, c, 128)
        acc = part if acc is None else g1.add(acc, part)
    return acc
