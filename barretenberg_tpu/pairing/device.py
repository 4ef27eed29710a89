"""Batched on-device optimal-ate pairing over the vectorized Fq12 tower.

Reference: curves/bn254/pairing.cpp:162-331 (miller_loop / miller_loop_batch
/ final_exponentiation). The host tower (pairing/tower.py) is the oracle.

TPU-first design, sized for XLA's compiler rather than translated from the
C++ control flow:

* Line coefficients for the (few, fixed) G2 points come from the HOST
  precompute (pairing/tower.precompute_miller_lines - the reference's
  precompute path, pairing.cpp:120-160), pre-scaled by the G1 coordinates
  (vw *= P.y, vv *= P.x) and uploaded as (L, 2, 18, B) fq2 arrays.
* The Miller loop is ONE lax.scan over the NAF steps: digit-0 steps
  multiply by an identity line (o=1, vw=vv=0 acts as 1 under sparse_mul),
  so the body is uniform - fq12 square + two sparse line muls - and the
  compiled graph holds exactly three fq12-op instances however many steps
  run (the unrolled chain would be ~150 instances).
* Lanes hold independent pairings; products over groups of g lanes (the
  verifier's e(A,Q1)*e(B,Q2) shape) fold with a log-depth rolled tree
  BEFORE the final exponentiation (sharing it - the rationale of
  miller_loop_batch, pairing.cpp:202-251, lifted to lanes).
* The final exponentiation's Fuentes-Castaneda chain executes on a
  MICROCODED fq12 register machine: a fori_loop over a host-built
  instruction table dispatching one lax.switch whose branches each hold a
  single fq12-op instance (mul / cyclotomic-sqr / conj / frobenius 1-3 /
  inverse / exp-by-neg-z). Unrolled, the chain is ~25 fq12 graphs and
  minutes of XLA lowering; microcoded it is 8 instances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fq
from ..fields.quadratic import QuadraticField
from ..fields.tower import SexticField, TwelfthField
from . import tower as ht

fq2 = QuadraticField(fq)
fq6 = SexticField(fq2)
fq12 = TwelfthField(fq6)

_NAF = ht._ATE_NAF
_Z_BITS = [(ht.BN_Z >> i) & 1 for i in range(ht.BN_Z.bit_length() - 2, -1, -1)]


# ---------------------------------------------------------------------------
# host-side line preparation
# ---------------------------------------------------------------------------
def _prepare_lines(groups):
    """groups: list of groups; each group a list of (P, Q[, lines]) with
    P = (px, py) host ints, Q = G2 affine ((x0,x1),(y0,y1)) or None when
    precomputed `lines` are passed. Returns (o, vw, vv) device arrays of
    shape (L+1, 2, 18, B), the per-step line indices, and the lane layout
    (n_groups, group_size)."""
    g_sizes = {len(g) for g in groups}
    assert len(g_sizes) == 1, "all groups must have the same size"
    gsize = g_sizes.pop()
    flat = [pair for grp in groups for pair in grp]
    b = len(flat)
    lines_per_pair = []
    for entry in flat:
        p, q = entry[0], entry[1]
        lines = entry[2] if len(entry) > 2 and entry[2] is not None else None
        if lines is None:
            lines = ht.precompute_miller_lines(q)
        px, py = p
        scaled = [
            (o, ht.fq2_scale(vw, py), ht.fq2_scale(vv, px))
            for (o, vw, vv) in lines
        ]
        lines_per_pair.append(scaled)
    n_lines = len(lines_per_pair[0])
    ident = ((1, 0), (0, 0), (0, 0))  # acts as multiplicative 1

    def enc(coord):
        rows = []
        for li in range(n_lines):
            rows.append(fq2.encode([lp[li][coord] for lp in lines_per_pair]))
        rows.append(fq2.encode([ident[coord]] * b))
        return jnp.stack(rows)  # (L+1, 2, 18, B)

    o_arr, vw_arr, vv_arr = enc(0), enc(1), enc(2)
    # per-NAF-step line indices (identity row = n_lines for skipped slots)
    i1, i2 = [], []
    it = 0
    for d in _NAF:
        i1.append(it)
        it += 1
        if d != 0:
            i2.append(it)
            it += 1
        else:
            i2.append(n_lines)
    # the final two frobenius add-lines (consumed after the loop)
    assert it == n_lines - 2
    return (o_arr, vw_arr, vv_arr), (np.array(i1), np.array(i2)), (len(groups), gsize)


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------
def _tree_mul_last_axis(x):
    """Product of fq12 lanes along the last axis -> that axis collapsed
    to length 1 (log-depth rolled tree, one mul instance)."""
    n = x.shape[-1]
    if n == 1:
        return x
    size = 1 << (n - 1).bit_length()
    if size != n:
        one = fq12.one(())
        pad = jnp.broadcast_to(
            one.reshape(one.shape + (1,) * (x.ndim - one.ndim)),
            x.shape[:-1] + (size - n,),
        )
        x = jnp.concatenate([x, pad], axis=-1)
    idx = jnp.arange(size, dtype=jnp.int32)

    def level(i, q):
        shift = jnp.int32(size) >> (i + 1)
        rolled = jnp.roll(q, -shift, axis=-1)
        return jnp.where(idx < shift, fq12.mul(q, rolled), q)

    out = jax.lax.fori_loop(0, size.bit_length() - 1, level, x)
    return out[..., :1]


@jax.jit
def _miller_jit(o_arr, vw_arr, vv_arr, i1, i2):
    b = o_arr.shape[-1]
    f = fq12.one((b,))
    xs = (
        (o_arr[i1], vw_arr[i1], vv_arr[i1]),
        (o_arr[i2], vw_arr[i2], vv_arr[i2]),
    )

    def body(f, lines):
        l1, l2 = lines
        f = fq12.sqr(f)
        f = fq12.sparse_mul(f, *l1)
        f = fq12.sparse_mul(f, *l2)
        return f, None

    f, _ = jax.lax.scan(body, f, xs)
    n_lines = o_arr.shape[0] - 1
    for li in (n_lines - 2, n_lines - 1):  # frobenius add-lines
        f = fq12.sparse_mul(f, o_arr[li], vw_arr[li], vv_arr[li])
    return f


# microcode opcodes
_MUL, _CSQ, _CONJ, _FROB1, _FROB2, _FROB3, _INV, _EXPZ = range(8)

# register program: easy part then the Fuentes-Castaneda chain
# (pairing.cpp:253-331; mirrors pairing/tower.final_exponentiation)
_PROGRAM = [
    (_CONJ, 0, 0, 1),
    (_INV, 0, 0, 2),
    (_MUL, 1, 2, 3),     # f^(p^6 - 1)
    (_FROB2, 3, 0, 4),
    (_MUL, 3, 4, 0),     # elt = easy part
    (_EXPZ, 0, 0, 1),    # A
    (_CSQ, 1, 0, 2),     # B
    (_CSQ, 2, 0, 3),     # C
    (_MUL, 3, 2, 4),     # D = C*B
    (_EXPZ, 4, 0, 5),    # E
    (_CSQ, 5, 0, 6),     # F
    (_EXPZ, 6, 0, 7),    # G
    (_CONJ, 4, 0, 8),    # H
    (_CONJ, 7, 0, 9),    # I
    (_MUL, 9, 5, 10),    # J = I*E
    (_MUL, 8, 10, 11),   # K = H*J
    (_MUL, 2, 11, 12),   # L = B*K
    (_MUL, 5, 11, 13),   # M = E*K
    (_MUL, 13, 0, 14),   # N = M*elt
    (_FROB1, 12, 0, 15),  # O
    (_MUL, 15, 14, 16),  # P = O*N
    (_FROB2, 11, 0, 17),  # Q
    (_MUL, 16, 17, 18),  # R = P*Q
    (_CONJ, 0, 0, 19),   # S
    (_MUL, 12, 19, 20),  # T = L*S
    (_FROB3, 20, 0, 21),  # U
    (_MUL, 18, 21, 22),  # result
]
_NREGS = 23
_RESULT_REG = 22


@jax.jit
def _final_exp_jit(f):
    batch = f.shape[-1]
    regs = jnp.zeros((_NREGS, 2, 3, 2, 18, batch), dtype=jnp.uint32)
    regs = regs.at[0].set(f)
    prog = jnp.asarray(np.array(_PROGRAM, dtype=np.int32))
    zbits = jnp.asarray(np.array(_Z_BITS, dtype=np.uint32))

    def op_mul(a, b):
        return fq12.mul(a, b)

    def op_csq(a, b):
        return fq12.cyclotomic_sqr(a)

    def op_conj(a, b):
        return fq12.conjugate(a)

    def op_frob1(a, b):
        return fq12.frobenius(a, 1)

    def op_frob2(a, b):
        return fq12.frobenius(a, 2)

    def op_frob3(a, b):
        return fq12.frobenius(a, 3)

    def op_inv(a, b):
        return fq12.invert(a)

    def op_expz(a, b):
        def step(r, bit):
            r = fq12.cyclotomic_sqr(r)
            return jnp.where(bit > 0, fq12.mul(r, a), r), None

        r, _ = jax.lax.scan(step, a, zbits)
        return fq12.conjugate(r)

    branches = [op_mul, op_csq, op_conj, op_frob1, op_frob2, op_frob3, op_inv, op_expz]

    def exec_step(i, regs):
        opcode, src_a, src_b, dst = prog[i, 0], prog[i, 1], prog[i, 2], prog[i, 3]
        a = regs[src_a]
        b = regs[src_b]
        val = jax.lax.switch(opcode, branches, a, b)
        return regs.at[dst].set(val)

    regs = jax.lax.fori_loop(0, len(_PROGRAM), exec_step, regs)
    return regs[_RESULT_REG]


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------
def reduced_ate_pairing_groups(groups):
    """For each group [(P, Q[, lines]), ...]: the product of the group's
    reduced ate pairings, computed on device. Returns the results as a
    list of host tower-fq12 values (one per group)."""
    (o_arr, vw_arr, vv_arr), (i1, i2), (n_groups, gsize) = _prepare_lines(groups)
    f = _miller_jit(o_arr, vw_arr, vv_arr, jnp.asarray(i1), jnp.asarray(i2))
    if gsize > 1:
        f = f.reshape(2, 3, 2, 18, n_groups, gsize)
        f = _group_product_jit(f)
    out = _final_exp_jit(f)
    return fq12.decode(out)


@jax.jit
def _group_product_jit(f6d):
    return _tree_mul_last_axis(f6d)[..., 0]


def reduced_ate_pairing(p, q) -> tuple:
    """Single pairing e(P, Q) on device; host tower-fq12 result
    (pairing.cpp:333-347's entry, device execution)."""
    return reduced_ate_pairing_groups([[(p, q)]])[0]


def pairing_check_groups(groups) -> list[bool]:
    """True per group iff the group's pairing product is one (the
    verifier / SRS-check shape e(A, Q1) * e(B, Q2) == 1)."""
    results = reduced_ate_pairing_groups(groups)
    return [ht.fq12_eq_one(r) for r in results]


def srs_on_curve_all(srs) -> bool:
    """y^2 == x^3 + 3 for EVERY monomial, one elementwise device sweep
    (test_io.cpp:12 checks all loaded points on-curve)."""
    import jax
    import jax.numpy as jnp

    from ..fields import fq

    @jax.jit
    def _chk(x, y):
        lhs = fq.sqr(y)
        rhs = fq.add(
            fq.mont_mul(fq.sqr(x), x), fq.full(x.shape[1:], fq.const(3))
        )
        return jnp.all(lhs == rhs)

    mono = srs.monomials
    return bool(_chk(mono.x, mono.y))


def validate_srs_rlc(srs, seed: int = 0xC0FFEE) -> bool:
    """Full-coverage SRS consistency via one random linear combination:
    e(-sum_i r_i [tau^i]G, [tau]G2) * e(sum_i r_i [tau^(i+1)]G, G2) == 1
    holds for random r iff every adjacent pair is tau-consistent (up to
    2^-254 soundness error). Two MSMs (reusing the compiled Pippenger
    shape) + one 2-pairing product cover ALL degree indices - the
    cryptographic scale-up of test_io.cpp:12's per-index pairing gate."""
    import jax.numpy as jnp
    import numpy as np

    from ..fields import fr
    from ..groups.g1 import g1, jacobian_to_host
    from ..msm import msm
    from ..utils import host_curve

    d = srs.degree
    rng = np.random.default_rng(seed)
    r = fr.random_elements(d, rng)
    zero = fr.zeros((1,))
    r_lo = jnp.concatenate([r[:, : d - 1], zero], axis=1)  # r_i at i < d-1
    r_hi = jnp.concatenate([zero, r[:, : d - 1]], axis=1)  # r_i at i+1
    pts = g1.take_affine(srs.monomials, jnp.arange(d))
    a = jacobian_to_host(msm(r_lo, pts))[0]
    b = jacobian_to_host(msm(r_hi, pts))[0]
    return pairing_check_groups(
        [[(host_curve.g1_neg(a), srs.g2_x), (b, host_curve.G2_GENERATOR)]]
    )[0]


def validate_srs_device(srs, indices=None) -> bool:
    """Batched SRS consistency proof: e(-[tau^i]G, [tau]G2) *
    e([tau^(i+1)]G, G2) == 1 for every sampled i, all lanes in one device
    sweep (the scaled-up analog of test_io.cpp:12's pairing gate)."""
    import jax.numpy as jnp

    from ..groups.g1 import points_to_host
    from ..utils import host_curve

    if indices is None:
        indices = range(srs.degree - 1)
    indices = list(indices)
    # decode only the sampled columns (a full monomials_host() at 2^20
    # costs minutes of host bigint conversion)
    cols = jnp.asarray(sorted({i for i in indices} | {i + 1 for i in indices}))
    from ..groups.g1 import g1 as _g1

    sampled = points_to_host(_g1.take_affine(srs.monomials, cols))
    col_pos = {int(c): k for k, c in enumerate(cols.tolist())}
    groups = []
    for i in indices:
        groups.append(
            [
                (host_curve.g1_neg(sampled[col_pos[i]]), srs.g2_x),
                (sampled[col_pos[i + 1]], host_curve.G2_GENERATOR),
            ]
        )
    return all(pairing_check_groups(groups))
