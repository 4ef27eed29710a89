"""PLONK prover: jit-compiled device phases with host Fiat-Shamir rounds.

Mirrors the round structure of the reference prover
(reference: waffle/proof_system/prover/prover.cpp:661-670):

  round 1: wire iffts + 3 wire commitments         -> gamma, beta
  round 2: grand product Z + commitment            -> alpha
  round 3: quotient T (the FFT-heavy phase) + 3 commitments -> z
  round 4: evaluations + linearization r(X)        -> nu
  round 5: Kate opening polynomials + 2 commitments

All polynomial data lives on device as (18, n) limb arrays. Challenges are
host ints (keccak transcript is inherently sequential host work) that enter
the device phases as ENCODED (18, 1) ARRAYS, so each phase is one jitted
dispatch compiled once per circuit size - not one dispatch per primitive
(remote-TPU dispatch latency would otherwise dominate) and not one compile
per proof. The reference's OpenMP domain loops (types.hpp:52-68) map to
whole-array lane parallelism; its 6 serial prefix-product chains
(prover.cpp:191-202) become one associative scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fq, fr
from ..groups import JacobianPoints
from ..groups.g1 import g1
from ..msm import msm
from ..polynomials import arithmetic, fft
from ..polynomials.domain import get_domain
from ..transcript import challenges as fs
from .linearizer import compute_linear_terms
from .permutation import compute_permutation_lagrange_base
from .proof import Proof

P = fr.p


def enc(value: int) -> jnp.ndarray:
    """Host int -> (18, 1) internal-Montgomery array (challenge transport)."""
    return fr.encode([value % P])


class Challenges:
    beta = 0
    gamma = 0
    alpha = 0
    z = 0
    nu = 0


class CircuitState:
    """Evaluation domains + scratch ffts (reference:
    waffle/proof_system/circuit_state.hpp)."""

    def __init__(self, n: int):
        self.n = n
        self.small_domain = get_domain(n)
        self.mid_domain = get_domain(2 * n)
        self.large_domain = get_domain(4 * n)
        for d in (self.small_domain, self.mid_domain, self.large_domain):
            d.warm_tables(inverse=False, coset=True)
            d.warm_tables(inverse=True)
        self.w_l_fft = None
        self.w_r_fft = None
        self.w_o_fft = None
        self.quotient_mid = None
        self.quotient_large = None

    @staticmethod
    def pad(coeffs: jnp.ndarray, size: int) -> jnp.ndarray:
        return jnp.pad(coeffs, ((0, 0), (0, size - coeffs.shape[1])))


# ---------------------------------------------------------------------------
# Jitted device phases (static over domains, dynamic over challenge arrays)
# ---------------------------------------------------------------------------
@jax.jit
def _z_evals_jit(w_l, w_r, w_o, s1, s2, s3, beta, gamma, bk1, bk2, small):
    """(prover.cpp:135-222): grand-product numerator/denominator lane
    products, one associative scan each, batch inversion, Z evaluations."""
    roots = small.root_vector()
    mul, add = fr.mont_mul, fr.add
    num = mul(
        mul(add(add(mul(roots, beta), gamma), w_l), add(add(mul(roots, bk1), gamma), w_r)),
        add(add(mul(roots, bk2), gamma), w_o),
    )
    den = mul(
        mul(add(add(mul(s1, beta), gamma), w_l), add(add(mul(s2, beta), gamma), w_r)),
        add(add(mul(s3, beta), gamma), w_o),
    )
    from ..utils.scans import hillis_scan

    pnum = hillis_scan(mul, num, axis=1)
    pden = hillis_scan(mul, den, axis=1)
    pden_inv = fr.batch_invert(pden)
    z_tail = mul(pnum, pden_inv)[:, : w_l.shape[1] - 1]
    one = fr.full((1,), fr.one)
    return jnp.concatenate([one, z_tail], axis=1)


@jax.jit
def _quotient_grand_product_jit(
    w_l_c, w_r_c, w_o_c, z_poly, s1_ev, s2_ev, s3_ev, ch, small, mid, large
):
    """Permutation + identity grand-product terms and the L_1 boundary terms
    (prover.cpp:224-402), as one fused graph. Returns the wire/z ffts (kept
    for the widgets), beta-scaled sigma coefficient forms, and the partial
    quotients."""
    n = small.size
    mul, add, sub = fr.mont_mul, fr.add, fr.sub

    def pad4(c):
        return jnp.pad(c, ((0, 0), (0, 4 * n - c.shape[1])))

    def coset_fft_large(c):
        return fft._fft_core(mul(c, large.coset_scale), large, inverse=False)

    w_l_fft = coset_fft_large(pad4(w_l_c))
    w_r_fft = coset_fft_large(pad4(w_r_c))
    w_o_fft = coset_fft_large(pad4(w_o_c))
    z_fft = mul(coset_fft_large(pad4(z_poly)), ch["alpha"])
    z_fft_shifted = jnp.roll(z_fft, -4, axis=1)  # Z(X.w), prover.cpp:280-289

    # sigma polys -> coefficient form scaled by beta (prover.cpp:245-269)
    dinv = fr.full((1,), fr.const(small.domain_inverse))

    def ifft_beta(ev):
        out = fft._fft_core(ev, small, inverse=True)
        return mul(mul(out, dinv), ch["beta"])

    s1_c = ifft_beta(s1_ev)
    s2_c = ifft_beta(s2_ev)
    s3_c = ifft_beta(s3_ev)

    def perm_factor(sigma_c, wire_c):
        s = add(sigma_c, wire_c)
        s = jnp.concatenate([add(s[:, :1], ch["gamma"]), s[:, 1:]], axis=1)
        return coset_fft_large(pad4(s))

    f1 = perm_factor(s1_c, w_l_c)
    f2 = perm_factor(s2_c, w_r_c)
    f3 = perm_factor(s3_c, w_o_c)
    quotient_large = fr.neg(mul(mul(f1, f2), mul(f3, z_fft_shifted)))

    # identity term (prover.cpp:302-341)
    coset = large.coset_root_vector()
    t0 = add(add(mul(coset, ch["beta"]), ch["gamma"]), w_l_fft)
    t1 = add(add(mul(coset, ch["bk1"]), ch["gamma"]), w_r_fft)
    t2 = add(add(mul(coset, ch["bk2"]), ch["gamma"]), w_o_fft)
    quotient_large = add(quotient_large, mul(mul(t0, t1), mul(t2, z_fft)))

    # boundary terms on the mid domain (prover.cpp:350-402)
    l_1 = arithmetic.compute_lagrange_polynomial_fft(small, mid)
    l_1_shifted = jnp.roll(l_1, -4, axis=1)
    t6 = mul(mul(sub(z_fft_shifted[:, ::2], ch["alpha"]), ch["alpha"]), l_1_shifted)
    t4 = mul(mul(sub(z_fft[:, ::2], ch["alpha"]), ch["alpha_sq"]), l_1)
    quotient_mid = add(t4, t6)

    return (
        w_l_fft,
        w_r_fft,
        w_o_fft,
        s1_c,
        s2_c,
        s3_c,
        quotient_mid,
        quotient_large,
    )


# ---------------------------------------------------------------------------
# Mesh-prover elementwise pieces: the quotient algebra between the sharded
# Bailey FFT calls (parallel/fft.py). Each is one jitted dispatch over
# mesh-sharded global arrays; XLA propagates the shardings (GSPMD), so the
# lane algebra partitions automatically and only the FFTs communicate.
# ---------------------------------------------------------------------------
@jax.jit
def _scale_jit(a, s):
    return fr.mont_mul(a, s)


@jax.jit
def _perm_factor_pre_jit(sigma_c, wire_c, gamma):
    s = fr.add(sigma_c, wire_c)
    return jnp.concatenate([fr.add(s[:, :1], gamma), s[:, 1:]], axis=1)


@jax.jit
def _quotient_combine_jit(f1, f2, f3, z_fft, w_l_fft, w_r_fft, w_o_fft, ch, large):
    mul, add = fr.mont_mul, fr.add
    z_fft_shifted = jnp.roll(z_fft, -4, axis=1)
    quotient_large = fr.neg(mul(mul(f1, f2), mul(f3, z_fft_shifted)))
    coset = large.coset_root_vector()
    t0 = add(add(mul(coset, ch["beta"]), ch["gamma"]), w_l_fft)
    t1 = add(add(mul(coset, ch["bk1"]), ch["gamma"]), w_r_fft)
    t2 = add(add(mul(coset, ch["bk2"]), ch["gamma"]), w_o_fft)
    return add(quotient_large, mul(mul(t0, t1), mul(t2, z_fft)))


@jax.jit
def _boundary_mid_jit(z_fft, ch, small, mid):
    mul, sub = fr.mont_mul, fr.sub
    z_fft_shifted = jnp.roll(z_fft, -4, axis=1)
    l_1 = arithmetic.compute_lagrange_polynomial_fft(small, mid)
    l_1_shifted = jnp.roll(l_1, -4, axis=1)
    t6 = mul(mul(sub(z_fft_shifted[:, ::2], ch["alpha"]), ch["alpha"]), l_1_shifted)
    t4 = mul(mul(sub(z_fft[:, ::2], ch["alpha"]), ch["alpha_sq"]), l_1)
    return fr.add(t4, t6)


@jax.jit
def _vanish_jit(evals, small, target):
    return arithmetic.divide_by_pseudo_vanishing_polynomial(evals, small, target)


@jax.jit
def _combine_quotients_jit(qm, ql):
    n2 = qm.shape[1]
    return jnp.concatenate([fr.add(ql[:, :n2], qm), ql[:, n2:]], axis=1)


@jax.jit
def _quotient_finalize_jit(quotient_mid, quotient_large, small, mid, large):
    """Z_H* division + coset iffts + mid/large combination
    (prover.cpp:453-463)."""
    n = small.size
    qm = arithmetic.divide_by_pseudo_vanishing_polynomial(quotient_mid, small, mid)
    ql = arithmetic.divide_by_pseudo_vanishing_polynomial(quotient_large, small, large)

    def coset_ifft(ev, dom):
        out = fft._fft_core(ev, dom, inverse=True)
        out = fr.mont_mul(out, fr.full((1,), fr.const(dom.domain_inverse)))
        return fr.mont_mul(out, dom.coset_scale_inverse)

    qm = coset_ifft(qm, mid)
    ql = coset_ifft(ql, large)
    return jnp.concatenate(
        [fr.add(ql[:, : 2 * n], qm), ql[:, 2 * n :]], axis=1
    )


@jax.jit
def _powers_jit(z_arr, table_shape_like):
    """(18, n) table of z^k from a (18, 1) z array (associative scan)."""
    from ..utils.scans import hillis_scan

    n = table_shape_like.shape[1]
    one = fr.full((1,), fr.one)
    zs = jnp.concatenate([one, jnp.broadcast_to(z_arr, (18, n - 1))], axis=1)
    return hillis_scan(fr.mont_mul, zs, axis=1)


@jax.jit
def _multi_eval_jit(polys, zp):
    """polys: (18, B, n); zp: (18, n) -> (18, B) evaluations."""
    prods = fr.mont_mul(polys, zp[:, None, :])
    n = prods.shape[2]
    while n > 1:
        half = n // 2
        lo = prods[:, :, :half]
        hi = prods[:, :, half : 2 * half]
        rem = prods[:, :, 2 * half :]
        prods = jnp.concatenate([fr.add(lo, hi), rem], axis=2)
        n = prods.shape[2]
    return prods[:, :, 0]


@jax.jit
def _linear_combo_jit(polys, scalars):
    """sum_j polys[:, j] * scalars[:, j]: polys (18, B, n), scalars (18, B)."""
    terms = fr.mont_mul(polys, scalars[:, :, None])
    b = terms.shape[1]
    acc = terms[:, 0]
    for j in range(1, b):
        acc = fr.add(acc, terms[:, j])
    return acc


@jax.jit
def _kate_jit(coeffs, f_eval, w_arr, neg_w_arr):
    """(F(X) - F(z)) / (X - z) via the affine-recurrence associative scan
    (polynomial_arithmetic.cpp:562-591). w_arr = -1/z encoded."""
    n = coeffs.shape[1]
    b0 = fr.mont_mul(fr.sub(coeffs[:, :1], f_eval), w_arr)
    b = fr.mont_mul(coeffs, w_arr)
    b = jnp.concatenate([b0, b[:, 1:]], axis=1)
    from ..utils.scans import affine_scan

    one = fr.full((1,), fr.one)
    m = jnp.concatenate([one, jnp.broadcast_to(neg_w_arr, (18, n - 1))], axis=1)
    return affine_scan(fr.mont_mul, fr.add, m, b, axis=1)


class Prover:
    """Inputs (from a composer or hand-built fixture):
      * wire values w_l/w_r/w_o in evaluation form, (18, n) device arrays;
      * sigma mappings (uint32 numpy arrays, composer encoding);
      * widgets (ProverArithmeticWidget etc.);
      * reference string (SRS) with >= n monomials.
    """

    def __init__(self, n: int, reference_string, mesh=None):
        assert n & (n - 1) == 0
        self.n = n
        self.state = CircuitState(n)
        self.reference_string = reference_string
        self.mesh = mesh  # optional jax.sharding.Mesh: sharded commit path
        self.monomials = g1.take_affine(
            reference_string.monomials, jnp.arange(n)
        )
        self.w_l = self.w_r = self.w_o = None  # (18, n) evaluation form
        self.sigma_1_mapping = None
        self.sigma_2_mapping = None
        self.sigma_3_mapping = None
        self.widgets = []
        self.proof = Proof()
        self.challenges = Challenges()
        # set during construct_proof
        self.sigma_1 = self.sigma_2 = self.sigma_3 = None
        self.z_poly = None
        self.r_poly = None

    def _mesh_fft_ok(self) -> bool:
        """True when all three domains split over the mesh (parallel/fft
        _split_sizes needs n1, n2 both divisible by the axis size); tiny
        fixtures fall back to replicated single-chip FFTs + sharded MSMs."""
        if self.mesh is None:
            return False
        from ..parallel.fft import _split_sizes

        d = self.mesh.shape["shards"]
        try:
            for sz in (self.n, 2 * self.n, 4 * self.n):
                _split_sizes(sz, d)
        except ValueError:
            return False
        return True

    # ------------------------------------------------------------------
    # SRS point tables are precomputed up to this size (above it, table
    # memory - rounds * 2n * 144B - outgrows the win; 2^18 ~ 760MB)
    _PRECOMP_MAX_N = 1 << 18
    _PRECOMP_MIN_N = 1 << 10

    def _precomputed_table(self):
        """Per-round SRS point table (single-chip path): commitments then
        cost ONE sort+segment-scan pass each, no per-round sorts/doublings
        (the reference likewise expands its SRS into a point table at load,
        reference_string.cpp:22-23)."""
        if self.mesh is not None or not (
            self._PRECOMP_MIN_N <= self.n <= self._PRECOMP_MAX_N
        ):
            return None
        return self.reference_string.pippenger_table(self.n)

    def commit(self, coeffs: jnp.ndarray) -> tuple:
        """MSM against the SRS monomials -> host affine point."""
        if self.mesh is not None:
            from ..parallel import sharded_msm

            res = sharded_msm(coeffs, self.monomials, self.mesh)
        else:
            table = self._precomputed_table()
            if table is not None:
                from ..msm.pippenger import pippenger_precomputed

                res = pippenger_precomputed(coeffs, table)
            else:
                res = msm(coeffs, self.monomials)
        aff = g1.batch_normalize(res)
        return (fq.decode(aff.x)[0], fq.decode(aff.y)[0])

    def commit_batch(self, coeffs_list) -> list:
        """B commitments as one batched MSM + one normalize + one host sync
        (the reference batches exactly these, scalar_multiplication.cpp:
        650-674). With a mesh, ALL B commitments run as ONE shard_map call
        (points sharded over chips, all_gather reduction)."""
        if self.mesh is not None:
            from ..parallel import sharded_msm_batched

            stacked = jnp.stack(coeffs_list, axis=1)  # (18, B, n)
            res = sharded_msm_batched(stacked, self.monomials, self.mesh)
        else:
            table = self._precomputed_table()
            if table is not None:
                from ..msm.pippenger import pippenger_precomputed

                outs = [pippenger_precomputed(s, table) for s in coeffs_list]
                res = JacobianPoints(
                    jnp.concatenate([o.x for o in outs], axis=1),
                    jnp.concatenate([o.y for o in outs], axis=1),
                    jnp.concatenate([o.z for o in outs], axis=1),
                    jnp.concatenate([o.inf for o in outs], axis=0),
                )
            else:
                from ..msm import batched_msm

                res = batched_msm(coeffs_list, self.monomials)
        aff = g1.batch_normalize(res)
        xs = fq.decode(aff.x)
        ys = fq.decode(aff.y)
        return list(zip(xs, ys))

    # ------------------------------------------------------------------
    # Round 1
    # ------------------------------------------------------------------
    def compute_wire_coefficients(self) -> None:
        """(prover.cpp:124-133) - keep evaluation copies for the grand
        product, convert wires to coefficient form."""
        small = self.state.small_domain
        self._w_l_evals, self._w_r_evals, self._w_o_evals = self.w_l, self.w_r, self.w_o
        if self._mesh_fft_ok():
            from ..parallel import sharded_ifft

            self.w_l = sharded_ifft(self.w_l, self.mesh)
            self.w_r = sharded_ifft(self.w_r, self.mesh)
            self.w_o = sharded_ifft(self.w_o, self.mesh)
        else:
            self.w_l = fft.ifft(self.w_l, small)
            self.w_r = fft.ifft(self.w_r, small)
            self.w_o = fft.ifft(self.w_o, small)

    def compute_wire_commitments(self) -> None:
        """(prover.cpp:65-86): one 3-way batched MSM."""
        (
            self.proof.w_l_commitment,
            self.proof.w_r_commitment,
            self.proof.w_o_commitment,
        ) = self.commit_batch([self.w_l, self.w_r, self.w_o])
        self.challenges.gamma = fs.compute_gamma(self.proof)
        self.challenges.beta = fs.compute_beta(self.proof, self.challenges.gamma)

    # ------------------------------------------------------------------
    # Round 2: grand product
    # ------------------------------------------------------------------
    def compute_z_coefficients(self) -> None:
        """(prover.cpp:135-222)."""
        small = self.state.small_domain
        beta, gamma = self.challenges.beta, self.challenges.gamma
        k1 = fr.params.multiplicative_generator
        k2 = fr.params.alternate_multiplicative_generator
        z_evals = _z_evals_jit(
            self._w_l_evals,
            self._w_r_evals,
            self._w_o_evals,
            self.sigma_1,
            self.sigma_2,
            self.sigma_3,
            enc(beta),
            enc(gamma),
            enc(beta * k1),
            enc(beta * k2),
            small,
        )
        self.z_poly = fft.ifft(z_evals, small)

    def compute_z_commitment(self) -> None:
        self.proof.z_commitment = self.commit(self.z_poly)
        self.challenges.alpha = fs.compute_alpha(self.proof)

    # ------------------------------------------------------------------
    # Round 3: quotient
    # ------------------------------------------------------------------
    # Above this size the monolithic fused quotient graph is split into
    # per-transform jitted stages: the axon remote-compile helper fails
    # (HTTP broken pipe / OOM) on the single 4n-wide fused graph at 2^22,
    # and the staged graphs are individually cacheable - a dozen ~24ms
    # dispatches cost nothing against a multi-second 2^20 quotient phase.
    _STAGED_QUOTIENT_MIN_N = 1 << 17

    def compute_quotient_polynomial(self) -> None:
        """(prover.cpp:405-465)."""
        if self._mesh_fft_ok():
            return self._compute_quotient_polynomial_mesh()
        if self.n >= self._STAGED_QUOTIENT_MIN_N:
            return self._compute_quotient_polynomial_staged()
        st = self.state
        small, mid, large = st.small_domain, st.mid_domain, st.large_domain
        alpha = self.challenges.alpha
        beta, gamma = self.challenges.beta, self.challenges.gamma
        k1 = fr.params.multiplicative_generator
        k2 = fr.params.alternate_multiplicative_generator

        ch = {
            "beta": enc(beta),
            "gamma": enc(gamma),
            "alpha": enc(alpha),
            "alpha_sq": enc(alpha * alpha),
            "bk1": enc(beta * k1),
            "bk2": enc(beta * k2),
        }
        (
            st.w_l_fft,
            st.w_r_fft,
            st.w_o_fft,
            self.sigma_1,
            self.sigma_2,
            self.sigma_3,
            st.quotient_mid,
            st.quotient_large,
        ) = _quotient_grand_product_jit(
            self.w_l,
            self.w_r,
            self.w_o,
            self.z_poly,
            self.sigma_1,
            self.sigma_2,
            self.sigma_3,
            ch,
            small,
            mid,
            large,
        )

        # widget gate constraints (prover.cpp:446-451)
        alpha_base = pow(alpha, 4, P)
        for w in self.widgets:
            alpha_base = w.compute_quotient_contribution(alpha_base, alpha, st)

        st.quotient_large = _quotient_finalize_jit(
            st.quotient_mid, st.quotient_large, small, mid, large
        )

    def _compute_quotient_polynomial_staged(self) -> None:
        """Single-chip staged quotient phase: the same per-transform
        decomposition as the mesh path (one jitted dispatch per FFT plus
        the small fused algebra kernels), for sizes where the monolithic
        graph breaks the remote compiler. Numerically identical to
        _quotient_grand_product_jit + _quotient_finalize_jit."""
        from ..polynomials import fft as _fft

        st = self.state
        small, mid, large = st.small_domain, st.mid_domain, st.large_domain
        alpha = self.challenges.alpha
        beta, gamma = self.challenges.beta, self.challenges.gamma
        k1 = fr.params.multiplicative_generator
        k2 = fr.params.alternate_multiplicative_generator
        ch = {
            "beta": enc(beta),
            "gamma": enc(gamma),
            "alpha": enc(alpha),
            "alpha_sq": enc(alpha * alpha),
            "bk1": enc(beta * k1),
            "bk2": enc(beta * k2),
        }
        n = self.n

        def pad4(c):
            return CircuitState.pad(c, 4 * n)

        st.w_l_fft = _fft.coset_fft(pad4(self.w_l), large)
        st.w_r_fft = _fft.coset_fft(pad4(self.w_r), large)
        st.w_o_fft = _fft.coset_fft(pad4(self.w_o), large)
        z_fft = _scale_jit(_fft.coset_fft(pad4(self.z_poly), large), ch["alpha"])

        s1_c = _scale_jit(_fft.ifft(self.sigma_1, small), ch["beta"])
        s2_c = _scale_jit(_fft.ifft(self.sigma_2, small), ch["beta"])
        s3_c = _scale_jit(_fft.ifft(self.sigma_3, small), ch["beta"])
        self.sigma_1, self.sigma_2, self.sigma_3 = s1_c, s2_c, s3_c

        f1 = _fft.coset_fft(pad4(_perm_factor_pre_jit(s1_c, self.w_l, ch["gamma"])), large)
        f2 = _fft.coset_fft(pad4(_perm_factor_pre_jit(s2_c, self.w_r, ch["gamma"])), large)
        f3 = _fft.coset_fft(pad4(_perm_factor_pre_jit(s3_c, self.w_o, ch["gamma"])), large)
        st.quotient_large = _quotient_combine_jit(
            f1, f2, f3, z_fft, st.w_l_fft, st.w_r_fft, st.w_o_fft, ch, large
        )
        st.quotient_mid = _boundary_mid_jit(z_fft, ch, small, mid)

        alpha_base = pow(alpha, 4, P)
        for w in self.widgets:
            alpha_base = w.compute_quotient_contribution(alpha_base, alpha, st)

        qm = _vanish_jit(st.quotient_mid, small, mid)
        ql = _vanish_jit(st.quotient_large, small, large)
        qm = _fft.coset_ifft(qm, mid)
        ql = _fft.coset_ifft(ql, large)
        st.quotient_large = _combine_quotients_jit(qm, ql)

    def _compute_quotient_polynomial_mesh(self) -> None:
        """Mesh path of the quotient phase: every n/2n/4n transform routed
        through the sharded Bailey FFT (parallel/fft.py) so the FFT-heavy
        round 3 scales over chips (the round-2 mesh prover sharded only its
        commitments); elementwise algebra runs as jitted dispatches over
        the sharded global arrays."""
        st = self.state
        small, mid, large = st.small_domain, st.mid_domain, st.large_domain
        mesh = self.mesh
        from ..parallel import sharded_coset_fft, sharded_ifft

        alpha = self.challenges.alpha
        beta, gamma = self.challenges.beta, self.challenges.gamma
        k1 = fr.params.multiplicative_generator
        k2 = fr.params.alternate_multiplicative_generator
        ch = {
            "beta": enc(beta),
            "gamma": enc(gamma),
            "alpha": enc(alpha),
            "alpha_sq": enc(alpha * alpha),
            "bk1": enc(beta * k1),
            "bk2": enc(beta * k2),
        }
        n = self.n

        def pad4(c):
            return CircuitState.pad(c, 4 * n)

        st.w_l_fft = sharded_coset_fft(pad4(self.w_l), mesh)
        st.w_r_fft = sharded_coset_fft(pad4(self.w_r), mesh)
        st.w_o_fft = sharded_coset_fft(pad4(self.w_o), mesh)
        z_fft = _scale_jit(sharded_coset_fft(pad4(self.z_poly), mesh), ch["alpha"])

        # sigma evals -> beta-scaled coefficient forms (sharded_ifft folds
        # in 1/n; prover.cpp:245-269)
        s1_c = _scale_jit(sharded_ifft(self.sigma_1, mesh), ch["beta"])
        s2_c = _scale_jit(sharded_ifft(self.sigma_2, mesh), ch["beta"])
        s3_c = _scale_jit(sharded_ifft(self.sigma_3, mesh), ch["beta"])
        self.sigma_1, self.sigma_2, self.sigma_3 = s1_c, s2_c, s3_c

        f1 = sharded_coset_fft(
            pad4(_perm_factor_pre_jit(s1_c, self.w_l, ch["gamma"])), mesh
        )
        f2 = sharded_coset_fft(
            pad4(_perm_factor_pre_jit(s2_c, self.w_r, ch["gamma"])), mesh
        )
        f3 = sharded_coset_fft(
            pad4(_perm_factor_pre_jit(s3_c, self.w_o, ch["gamma"])), mesh
        )
        st.quotient_large = _quotient_combine_jit(
            f1, f2, f3, z_fft, st.w_l_fft, st.w_r_fft, st.w_o_fft, ch, large
        )
        st.quotient_mid = _boundary_mid_jit(z_fft, ch, small, mid)

        alpha_base = pow(alpha, 4, P)
        for w in self.widgets:
            alpha_base = w.compute_quotient_contribution(alpha_base, alpha, st)

        qm = _vanish_jit(st.quotient_mid, small, mid)
        ql = _vanish_jit(st.quotient_large, small, large)
        qm = sharded_coset_fft(qm, mesh, inverse=True)
        ql = sharded_coset_fft(ql, mesh, inverse=True)
        st.quotient_large = _combine_quotients_jit(qm, ql)

    def compute_quotient_commitment(self) -> None:
        """(prover.cpp:107-122)."""
        q = self.state.quotient_large
        n = self.n
        (
            self.proof.t_lo_commitment,
            self.proof.t_mid_commitment,
            self.proof.t_hi_commitment,
        ) = self.commit_batch([q[:, :n], q[:, n : 2 * n], q[:, 2 * n : 3 * n]])
        self.challenges.z = fs.compute_evaluation_challenge(self.proof)

    # ------------------------------------------------------------------
    # Round 4: evaluations + linearization
    # ------------------------------------------------------------------
    def compute_linearisation_coefficients(self) -> int:
        """(prover.cpp:467-538). Returns t_eval."""
        st = self.state
        n = self.n
        z = self.challenges.z
        beta_inv = pow(self.challenges.beta, -1, P)
        shifted_z = z * st.small_domain.root % P

        # all the size-n evaluations at z and z*w as two batched dispatches
        zp = _powers_jit(enc(z), self.w_l)
        zp_shift = _powers_jit(enc(shifted_z), self.w_l)
        polys_z = jnp.stack([self.w_l, self.w_r, self.w_o, self.sigma_1, self.sigma_2], axis=1)
        evals_z = fr.decode(_multi_eval_jit(polys_z, zp))
        self.proof.w_l_eval = evals_z[0]
        self.proof.w_r_eval = evals_z[1]
        self.proof.w_o_eval = evals_z[2]
        # sigma polys are beta-scaled in coefficient form; undo for the proof
        self.proof.sigma_1_eval = evals_z[3] * beta_inv % P
        self.proof.sigma_2_eval = evals_z[4] * beta_inv % P

        deps = set()
        for w in self.widgets:
            deps |= w.dependencies
        from .widgets import (
            REQUIRES_W_L_SHIFTED,
            REQUIRES_W_O_SHIFTED,
            REQUIRES_W_R_SHIFTED,
        )

        shift_polys = [self.z_poly]
        for flag, wire in (
            (REQUIRES_W_L_SHIFTED, self.w_l),
            (REQUIRES_W_R_SHIFTED, self.w_r),
            (REQUIRES_W_O_SHIFTED, self.w_o),
        ):
            if flag in deps:
                shift_polys.append(wire)
        evals_sh = fr.decode(
            _multi_eval_jit(jnp.stack(shift_polys, axis=1), zp_shift)
        )
        self.proof.z_1_shifted_eval = evals_sh[0]
        idx = 1
        for flag, attr in (
            (REQUIRES_W_L_SHIFTED, "w_l_shifted_eval"),
            (REQUIRES_W_R_SHIFTED, "w_r_shifted_eval"),
            (REQUIRES_W_O_SHIFTED, "w_o_shifted_eval"),
        ):
            if flag in deps:
                setattr(self.proof, attr, evals_sh[idx])
                idx += 1

        for w in self.widgets:
            w.compute_proof_elements(self.proof, z)

        t_eval = arithmetic.evaluate(self.state.quotient_large[:, : 3 * n], z)

        lagrange_evals = arithmetic.get_lagrange_evaluations(z, st.small_domain)
        linear_terms = compute_linear_terms(
            self.proof, self.challenges, lagrange_evals.l_1
        )

        r = _linear_combo_jit(
            jnp.stack([self.z_poly, self.sigma_3], axis=1),
            jnp.concatenate(
                [enc(linear_terms.z_1), enc(linear_terms.sigma_3 * beta_inv)],
                axis=1,
            ),
        )
        alpha_base = pow(self.challenges.alpha, 4, P)
        for w in self.widgets:
            alpha_base, r = w.compute_linear_contribution(
                alpha_base, self.challenges.alpha, self.proof, r
            )
        self.r_poly = r
        self.proof.linear_eval = arithmetic.evaluate(r, z)
        return t_eval

    # ------------------------------------------------------------------
    # Round 5: Kate openings
    # ------------------------------------------------------------------
    def compute_opening_elements(self) -> None:
        """(prover.cpp:540-659)."""
        st = self.state
        n = self.n
        t_eval = self.compute_linearisation_coefficients()
        self.challenges.nu = fs.compute_linearisation_challenge(self.proof, t_eval)

        nu = self.challenges.nu
        nu_pow = [pow(nu, k, P) for k in range(1, 10)]
        beta_inv = pow(self.challenges.beta, -1, P)
        z = self.challenges.z
        z_pow_n = pow(z, n, P)
        z_pow_2n = pow(z, 2 * n, P)

        q = st.quotient_large
        opening = _linear_combo_jit(
            jnp.stack(
                [
                    q[:, :n],
                    q[:, n : 2 * n],
                    q[:, 2 * n : 3 * n],
                    self.r_poly,
                    self.w_l,
                    self.w_r,
                    self.w_o,
                    self.sigma_1,
                    self.sigma_2,
                ],
                axis=1,
            ),
            jnp.concatenate(
                [
                    enc(1),
                    enc(z_pow_n),
                    enc(z_pow_2n),
                    enc(nu_pow[0]),
                    enc(nu_pow[1]),
                    enc(nu_pow[2]),
                    enc(nu_pow[3]),
                    enc(nu_pow[4] * beta_inv),
                    enc(nu_pow[5] * beta_inv),
                ],
                axis=1,
            ),
        )
        shifted_terms = [(self.z_poly, nu_pow[6])]

        nu_base = nu_pow[7]
        deps = set()
        for w in self.widgets:
            deps |= w.dependencies
        from .widgets import (
            REQUIRES_W_L_SHIFTED,
            REQUIRES_W_O_SHIFTED,
            REQUIRES_W_R_SHIFTED,
        )

        for flag, wire in (
            (REQUIRES_W_L_SHIFTED, self.w_l),
            (REQUIRES_W_R_SHIFTED, self.w_r),
            (REQUIRES_W_O_SHIFTED, self.w_o),
        ):
            if flag in deps:
                shifted_terms.append((wire, nu_base))
                nu_base = nu_base * nu % P
        shifted_opening = _linear_combo_jit(
            jnp.stack([t for t, _ in shifted_terms], axis=1),
            jnp.concatenate([enc(s) for _, s in shifted_terms], axis=1),
        )

        for w in self.widgets:
            opening, nu_base = w.compute_opening_poly_contribution(
                opening, nu_base, nu
            )

        shifted_z = z * st.small_domain.root % P
        opening_w = self._kate(opening, z)
        shifted_w = self._kate(shifted_opening, shifted_z)
        (
            self.proof.pi_z_commitment,
            self.proof.pi_z_omega_commitment,
        ) = self.commit_batch([opening_w, shifted_w])

    def _kate(self, coeffs, point: int):
        f_val = arithmetic.evaluate(coeffs, point)
        w = (-pow(point, -1, P)) % P
        return _kate_jit(coeffs, enc(f_val), enc(w), enc((-w) % P))

    # ------------------------------------------------------------------
    def construct_proof(self, timings: dict | None = None) -> Proof:
        """(prover.cpp:661-670). Pass a dict as `timings` to record
        per-phase wall seconds (each phase is then fenced with a one-element
        device fetch - the only reliable sync through the remote tunnel)."""
        small = self.state.small_domain

        def _phase(name, fn, probe=None):
            import time as _time

            t0 = _time.perf_counter()
            try:
                fn()
            except Exception as e:  # transient remote-compile drops: retry once
                msg = str(e)
                if "remote_compile" not in msg and "Network Error" not in msg:
                    raise
                _time.sleep(5.0)
                fn()
            if timings is not None:
                if probe is not None:
                    arr = probe()
                    np.asarray(arr[(slice(0, 1),) * arr.ndim])
                timings[name] = round(_time.perf_counter() - t0, 4)

        def _sigmas():
            self.sigma_1 = compute_permutation_lagrange_base(
                self.sigma_1_mapping, small
            )
            self.sigma_2 = compute_permutation_lagrange_base(
                self.sigma_2_mapping, small
            )
            self.sigma_3 = compute_permutation_lagrange_base(
                self.sigma_3_mapping, small
            )

        _phase("sigma_bases", _sigmas, lambda: self.sigma_3)
        _phase(
            "wire_ifft", self.compute_wire_coefficients, lambda: self.w_o
        )
        _phase("wire_commit", self.compute_wire_commitments)
        _phase(
            "grand_product", self.compute_z_coefficients, lambda: self.z_poly
        )
        _phase("z_commit", self.compute_z_commitment)
        _phase(
            "quotient",
            self.compute_quotient_polynomial,
            lambda: self.state.quotient_large,
        )
        _phase("quotient_commit", self.compute_quotient_commitment)
        _phase("opening", self.compute_opening_elements)
        return self.proof
