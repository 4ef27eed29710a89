"""BN254 G1 instantiation (reference: curves/bn254/g1.hpp).

Curve: y^2 = x^3 + 3 over Fq, generator (1, 2) (one_y/b constants of
g1.hpp:9-17 decode to these values).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from ..fields import fq, fr
from ..utils import host_curve
from .group import AffinePoints, Curve, JacobianPoints

g1 = Curve(fq, b_value=3, generator_xy=(1, 2))


import jax as _jax


@_jax.jit
def _hash_to_curve_jit(xs: jnp.ndarray):
    """Candidate x's (18, m) -> (y, ok): y = sqrt(x^3 + b) via one batched
    pow chain (q = 3 mod 4), ok where x^3 + b is a quadratic residue."""
    yy = fq.add(fq.mont_mul(fq.sqr(xs), xs), fq.full(xs.shape[1:], fq.const(3)))
    y = fq.sqrt(yy)
    ok = fq.eq(fq.sqr(y), yy)
    return y, ok


def _x_candidate(seed: bytes, lane: int, attempt: int) -> int:
    from ..transcript.keccak import keccak256

    h = keccak256(
        seed + lane.to_bytes(8, "little") + attempt.to_bytes(4, "little")
    )
    return int.from_bytes(h, "big") % fq.p


def hash_to_curve(seed: bytes, n: int = 1, attempts: int = 8) -> AffinePoints:
    """Deterministic hash-to-curve for n G1 points (the reference's
    random_coordinates_on_curve rejection walk, groups/group.hpp:49-71,
    enabled by can_hash_to_curve, g1.hpp:12): x candidates are
    keccak256(seed || lane || attempt) mod q; each lane takes its first x
    with x^3 + b a quadratic residue and y = sqrt(x^3 + b). The QR test
    and square root run BATCHED on device (one pow-chain dispatch for all
    n * attempts candidates) instead of the reference's per-point loop;
    lanes that miss `attempts` times (p ~ 2^-attempts) finish on host."""
    cand = [
        _x_candidate(seed, lane, j) for lane in range(n) for j in range(attempts)
    ]
    xs = fq.encode(cand)
    y, ok = _hash_to_curve_jit(xs)
    okh = np.asarray(ok).reshape(n, attempts)
    first = np.argmax(okh, axis=1)  # first accepting attempt per lane
    cols = jnp.asarray(np.arange(n) * attempts + first)
    x_sel = jnp.take(xs, cols, axis=1)
    y_sel = jnp.take(y, cols, axis=1)
    misses = np.nonzero(~okh.any(axis=1))[0]
    if len(misses):  # host completion of the rare exhausted lanes
        fix_x, fix_y = [], []
        for lane in misses:
            j = attempts
            while True:
                x = _x_candidate(seed, int(lane), j)
                yy = (x * x % fq.p * x + 3) % fq.p
                yv = pow(yy, (fq.p + 1) // 4, fq.p)
                if yv * yv % fq.p == yy:
                    fix_x.append(x)
                    fix_y.append(yv)
                    break
                j += 1
        midx = jnp.asarray(misses)
        x_sel = x_sel.at[:, midx].set(fq.encode(fix_x))
        y_sel = y_sel.at[:, midx].set(fq.encode(fix_y))
    return AffinePoints(x_sel, y_sel, jnp.zeros(n, dtype=bool))


def random_affine_points(n: int, rng: np.random.Generator) -> AffinePoints:
    """Seeded random on-curve affine points via the device hash-to-curve
    walk (the reference's random_affine_element, groups/group.hpp:99-114,
    which hashes to the curve when can_hash_to_curve)."""
    return hash_to_curve(rng.bytes(32), n)


def points_to_host(p: AffinePoints) -> list:
    """Affine device batch -> list of host (x, y) tuples / None."""
    xs = fq.decode(p.x)
    ys = fq.decode(p.y)
    infs = np.asarray(p.inf)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


def jacobian_to_host(p: JacobianPoints) -> list:
    return points_to_host(g1.batch_normalize(p))


def host_to_affine_points(pts: list) -> AffinePoints:
    xs = [0 if pt is None else pt[0] for pt in pts]
    ys = [0 if pt is None else pt[1] for pt in pts]
    inf = jnp.asarray([pt is None for pt in pts], dtype=bool)
    return AffinePoints(fq.encode(xs), fq.encode(ys), inf)


def scalars_to_bits_msb(scalars: list, nbits: int = 254) -> jnp.ndarray:
    """Host ints -> (nbits, N) uint32 MSB-first bit array, vectorized."""
    n = len(scalars)
    buf = np.frombuffer(
        b"".join(int(s).to_bytes(32, "big") for s in scalars), dtype=np.uint8
    ).reshape(n, 32)
    bits = np.unpackbits(buf, axis=1)  # (N, 256) MSB-first
    return jnp.asarray(bits[:, 256 - nbits :].T.astype(np.uint32))


@_jax.jit
def _multi_scalar_gen(bits: jnp.ndarray) -> AffinePoints:
    n = bits.shape[1]
    jac = g1.scalar_mul_bits(g1.generator((n,)), bits)
    return g1.batch_normalize(jac)


def random_points_device(n: int, rng: np.random.Generator) -> AffinePoints:
    """n random multiples of the generator, computed as ONE vectorized
    double-and-add sweep on device (the bulk analog of
    random_affine_points; O(254) steps for any n)."""
    scalars = [
        int.from_bytes(rng.bytes(32), "little") % fr.p or 1 for _ in range(n)
    ]
    bits = scalars_to_bits_msb(scalars)
    return _multi_scalar_gen(bits)


@functools.partial(_jax.jit, static_argnames=("c",))
def _scalar_mul_glv_impl(px, py, pinf, scalars_mont, c: int) -> JacobianPoints:
    from ..msm.wnaf import signed_digits, split_scalars

    p = AffinePoints(px, py, pinf)
    k1, k2 = split_scalars(scalars_mont)
    d1 = signed_digits(k1, c)
    d2 = signed_digits(k2, c)
    tab = g1._build_mul_table(p, (1 << (c - 1)) + 1)
    # endo image of every table entry: psi(x,y,z) = (beta*x, -y, z) - the
    # Jacobian form of the affine endomorphism (scalar_multiplication.cpp:
    # 131-140), so k*P = walk(k1 against T) + walk(k2 against psi(T))
    tab2 = JacobianPoints(
        fq.mul_by_constant(tab.x, fq.params.cube_root),
        fq.neg(tab.y),
        tab.z,
        tab.inf,
    )
    return g1._windowed_walk([tab, tab2], [d1, d2], c)


def scalar_mul_glv(
    p: AffinePoints, scalars_mont: jnp.ndarray, c: int = 5
) -> JacobianPoints:
    """Arbitrary-base GLV + signed-window scalar multiplication
    (reference group_exponentiation_endo, groups/group.hpp:653-760):
    half-length digit walks over P and psi(P) share the doublings, so a
    254-bit multiply costs ~127 doublings + 2*ceil(128/c) adds + a
    2^(c-1)-entry table instead of 254 doubling+add steps."""
    return _scalar_mul_glv_impl(p.x, p.y, p.inf, scalars_mont, c)


_fixed_base_table_cache: AffinePoints | None = None


def _fixed_base_table() -> AffinePoints:
    """(18, 32*256) window table: entry [w*256 + k] = [k * 2^(8w)]G, built
    once on host (~8k host group adds) and cached as device constants.

    The fixed-base analog of the reference's GLV+wNAF precomputed-table
    exponentiation (groups/group.hpp:653-760): for a FIXED base the whole
    table precomputes, so a 254-bit multiply needs 32 gathers + 32 mixed
    adds and zero doublings."""
    global _fixed_base_table_cache
    if _fixed_base_table_cache is not None:
        return _fixed_base_table_cache
    pts: list = []
    base = host_curve.G1_GENERATOR
    for _w in range(32):
        cur = None
        row = [None]
        for _k in range(255):
            cur = host_curve.g1_add(cur, base)
            row.append(cur)
        pts.extend(row)
        base = host_curve.g1_add(cur, base)  # 256*2^(8w)*G = 2^(8(w+1))*G
    _fixed_base_table_cache = host_to_affine_points(pts)
    return _fixed_base_table_cache


@_jax.jit
def _fixed_base_mul_jit(digits, tx, ty, tinf) -> JacobianPoints:
    n = digits.shape[1]

    def win(w, acc):
        idx = w * 256 + digits[w]
        pts = AffinePoints(
            jnp.take(tx, idx, axis=1),
            jnp.take(ty, idx, axis=1),
            jnp.take(tinf, idx, axis=0),
        )
        return g1.mixed_add(acc, pts)

    return _jax.lax.fori_loop(0, 32, win, g1.infinity((n,)))


def fixed_base_mul(scalars: list) -> JacobianPoints:
    """[k_i]G for a list of host-int scalars, via the window table: one
    fori_loop of 32 gather+mixed_add steps for any batch size (the fast
    path for SRS generation and any generator exponentiation)."""
    n = len(scalars)
    buf = np.frombuffer(
        b"".join((int(s) % fr.p).to_bytes(32, "little") for s in scalars),
        dtype=np.uint8,
    ).reshape(n, 32)
    digits = jnp.asarray(buf.T.astype(np.int32))  # (32, n) window bytes
    table = _fixed_base_table()
    return _fixed_base_mul_jit(digits, table.x, table.y, table.inf)


def scalar_mul(p: AffinePoints, scalar: int) -> JacobianPoints:
    """Multiply a batch of affine points by one host-known scalar."""
    scalar = int(scalar) % fr.p
    if scalar == 0:
        return g1.infinity(p.x.shape[1:])
    nbits = scalar.bit_length()
    bits = jnp.asarray(
        [[(scalar >> (nbits - 1 - i)) & 1] for i in range(nbits)], dtype=jnp.uint32
    )
    bits = jnp.broadcast_to(bits, (nbits, *p.x.shape[1:]))
    return g1.scalar_mul_bits(p, bits)
