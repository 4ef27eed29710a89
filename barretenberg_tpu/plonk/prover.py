"""PLONK prover, TPU-resident bulk math with host Fiat-Shamir rounds.

Mirrors the round structure of the reference prover
(reference: waffle/proof_system/prover/prover.cpp:661-670):

  round 1: wire iffts + 3 wire commitments         -> gamma, beta
  round 2: grand product Z + commitment            -> alpha
  round 3: quotient T (the FFT-heavy phase) + 3 commitments -> z
  round 4: evaluations + linearization r(X)        -> nu
  round 5: Kate opening polynomials + 2 commitments

All polynomial data lives on device as (18, n) limb arrays; challenges are
host ints (keccak transcript is inherently sequential host work); per-round
device work is dispatched eagerly. The reference's OpenMP domain loops
(types.hpp:52-68) map to whole-array lane parallelism; its 6 serial prefix-
product chains (prover.cpp:191-202) become one associative scan.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import fq, fr
from ..groups.g1 import g1
from ..msm import msm
from ..polynomials import arithmetic, fft
from ..polynomials.domain import get_domain
from ..transcript import challenges as fs
from .linearizer import compute_linear_terms
from .permutation import compute_permutation_lagrange_base
from .proof import Proof

P = fr.p


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
        self.w_l_fft = None
        self.w_r_fft = None
        self.w_o_fft = None
        self.quotient_mid = None
        self.quotient_large = None

    @staticmethod
    def pad(coeffs: jnp.ndarray, size: int) -> jnp.ndarray:
        return jnp.pad(coeffs, ((0, 0), (0, size - coeffs.shape[1])))


class Prover:
    """Inputs (from a composer or hand-built fixture):
      * wire values w_l/w_r/w_o in evaluation form, (18, n) device arrays;
      * sigma mappings (uint32 numpy arrays, composer encoding);
      * widgets (ProverArithmeticWidget etc.);
      * reference string (SRS) with >= n monomials.
    """

    def __init__(self, n: int, reference_string):
        assert n & (n - 1) == 0
        self.n = n
        self.state = CircuitState(n)
        self.reference_string = reference_string
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

    # ------------------------------------------------------------------
    def commit(self, coeffs: jnp.ndarray) -> tuple:
        """MSM against the SRS monomials -> host affine point."""
        res = msm(coeffs, self.monomials)
        aff = g1.batch_normalize(res)
        return (fq.decode(aff.x)[0], fq.decode(aff.y)[0])

    def commit_batch(self, coeffs_list) -> list:
        """B commitments as one batched MSM + one normalize + one host sync
        (the reference batches exactly these, scalar_multiplication.cpp:
        650-674)."""
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
        """(prover.cpp:135-222). The reference's 6 thread-parallel
        accumulators + serial prefix products become two lane products and
        one associative scan + batch inversion."""
        small = self.state.small_domain
        n = self.n
        beta, gamma = self.challenges.beta, self.challenges.gamma
        k1 = fr.params.multiplicative_generator
        k2 = fr.params.alternate_multiplicative_generator

        roots = small.root_vector()  # w^i
        beta_roots = fr.mul_by_constant(roots, beta)
        gamma_b = fr.full((n,), fr.const(gamma))

        num = fr.mont_mul(
            fr.mont_mul(
                fr.add(fr.add(beta_roots, gamma_b), self._w_l_evals),
                fr.add(
                    fr.add(fr.mul_by_constant(roots, beta * k1 % P), gamma_b),
                    self._w_r_evals,
                ),
            ),
            fr.add(
                fr.add(fr.mul_by_constant(roots, beta * k2 % P), gamma_b),
                self._w_o_evals,
            ),
        )
        den = fr.mont_mul(
            fr.mont_mul(
                fr.add(
                    fr.add(fr.mul_by_constant(self.sigma_1, beta), gamma_b),
                    self._w_l_evals,
                ),
                fr.add(
                    fr.add(fr.mul_by_constant(self.sigma_2, beta), gamma_b),
                    self._w_r_evals,
                ),
            ),
            fr.add(
                fr.add(fr.mul_by_constant(self.sigma_3, beta), gamma_b),
                self._w_o_evals,
            ),
        )
        import jax

        pnum = jax.lax.associative_scan(fr.mont_mul, num, axis=1)
        pden = jax.lax.associative_scan(fr.mont_mul, den, axis=1)
        pden_inv = fr.batch_invert(pden)
        z_tail = fr.mont_mul(pnum, pden_inv)[:, : n - 1]
        one = fr.full((1,), fr.one)
        z_evals = jnp.concatenate([one, z_tail], axis=1)
        self.z_poly = fft.ifft(z_evals, small)

    def compute_z_commitment(self) -> None:
        self.proof.z_commitment = self.commit(self.z_poly)
        self.challenges.alpha = fs.compute_alpha(self.proof)

    # ------------------------------------------------------------------
    # Round 3: quotient
    # ------------------------------------------------------------------
    def compute_quotient_polynomial(self) -> None:
        """(prover.cpp:405-465)."""
        st = self.state
        small, mid, large = st.small_domain, st.mid_domain, st.large_domain
        n = self.n
        alpha = self.challenges.alpha
        beta, gamma = self.challenges.beta, self.challenges.gamma
        k1 = fr.params.multiplicative_generator
        k2 = fr.params.alternate_multiplicative_generator

        # 4n coset ffts of the wires
        st.w_l_fft = fft.coset_fft(st.pad(self.w_l, 4 * n), large)
        st.w_r_fft = fft.coset_fft(st.pad(self.w_r, 4 * n), large)
        st.w_o_fft = fft.coset_fft(st.pad(self.w_o, 4 * n), large)

        z_fft = fft.coset_fft_with_constant(
            st.pad(self.z_poly, 4 * n), large, alpha
        )
        z_fft_shifted = jnp.roll(z_fft, -4, axis=1)  # Z(X.w), prover.cpp:280-289

        # --- permutation grand product term (prover.cpp:224-300) ---------
        # sigma polys -> coefficient form scaled by beta; keep for later.
        self.sigma_1 = fft.ifft_with_constant(self.sigma_1, small, beta)
        self.sigma_2 = fft.ifft_with_constant(self.sigma_2, small, beta)
        self.sigma_3 = fft.ifft_with_constant(self.sigma_3, small, beta)

        gamma_enc = fr.encode([gamma])

        def perm_factor(sigma_coeff, wire_coeff):
            s = fr.add(sigma_coeff, wire_coeff)
            s = jnp.concatenate(
                [fr.add(s[:, :1], gamma_enc), s[:, 1:]], axis=1
            )
            return fft.coset_fft(st.pad(s, 4 * n), large)

        f1 = perm_factor(self.sigma_1, self.w_l)
        f2 = perm_factor(self.sigma_2, self.w_r)
        f3 = perm_factor(self.sigma_3, self.w_o)
        perm = fr.mont_mul(fr.mont_mul(f1, f2), fr.mont_mul(f3, z_fft_shifted))
        st.quotient_large = fr.neg(perm)

        # --- identity grand product term (prover.cpp:302-341) ------------
        coset = large.coset_root_vector()  # g * w4^i
        beta_id = fr.mul_by_constant(coset, beta)
        gamma_b4 = fr.full((4 * n,), fr.const(gamma))
        t0 = fr.add(fr.add(beta_id, gamma_b4), st.w_l_fft)
        t1 = fr.add(
            fr.add(fr.mul_by_constant(coset, beta * k1 % P), gamma_b4), st.w_r_fft
        )
        t2 = fr.add(
            fr.add(fr.mul_by_constant(coset, beta * k2 % P), gamma_b4), st.w_o_fft
        )
        ident = fr.mont_mul(fr.mont_mul(t0, t1), fr.mont_mul(t2, z_fft))
        st.quotient_large = fr.add(st.quotient_large, ident)

        # --- boundary terms on the mid domain (prover.cpp:350-402) -------
        l_1 = arithmetic.compute_lagrange_polynomial_fft(small, mid)
        l_1_shifted = jnp.roll(l_1, -4, axis=1)  # L_{n-1} on the coset
        alpha_enc = fr.encode([alpha])
        # T6 = (Z(X.w) - 1).alpha^2.L_{n-1}: z_fft carries alpha already
        t6 = fr.mont_mul(
            fr.mul_by_constant(
                fr.sub(z_fft_shifted[:, ::2], alpha_enc), alpha
            ),
            l_1_shifted,
        )
        # T4 = (Z(X) - 1).alpha^3.L_1
        t4 = fr.mont_mul(
            fr.mul_by_constant(
                fr.sub(z_fft[:, ::2], alpha_enc), alpha * alpha % P
            ),
            l_1,
        )
        st.quotient_mid = fr.add(t4, t6)

        # --- widget gate constraints (prover.cpp:446-451) -----------------
        alpha_base = pow(alpha, 4, P)
        for w in self.widgets:
            alpha_base = w.compute_quotient_contribution(alpha_base, alpha, st)

        # --- divide by Z_H*, back to coefficient form ---------------------
        st.quotient_mid = arithmetic.divide_by_pseudo_vanishing_polynomial(
            st.quotient_mid, small, mid
        )
        st.quotient_large = arithmetic.divide_by_pseudo_vanishing_polynomial(
            st.quotient_large, small, large
        )
        st.quotient_mid = fft.coset_ifft(st.quotient_mid, mid)
        st.quotient_large = fft.coset_ifft(st.quotient_large, large)
        st.quotient_large = jnp.concatenate(
            [
                fr.add(st.quotient_large[:, : 2 * n], st.quotient_mid),
                st.quotient_large[:, 2 * n :],
            ],
            axis=1,
        )

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

        self.proof.w_l_eval = arithmetic.evaluate(self.w_l, z)
        self.proof.w_r_eval = arithmetic.evaluate(self.w_r, z)
        self.proof.w_o_eval = arithmetic.evaluate(self.w_o, z)
        deps = set()
        for w in self.widgets:
            deps |= w.dependencies
        from .widgets import (
            REQUIRES_W_L_SHIFTED,
            REQUIRES_W_O_SHIFTED,
            REQUIRES_W_R_SHIFTED,
        )

        if REQUIRES_W_L_SHIFTED in deps:
            self.proof.w_l_shifted_eval = arithmetic.evaluate(self.w_l, shifted_z)
        if REQUIRES_W_R_SHIFTED in deps:
            self.proof.w_r_shifted_eval = arithmetic.evaluate(self.w_r, shifted_z)
        if REQUIRES_W_O_SHIFTED in deps:
            self.proof.w_o_shifted_eval = arithmetic.evaluate(self.w_o, shifted_z)

        # sigma polys are beta-scaled in coefficient form; undo for the proof
        self.proof.sigma_1_eval = (
            arithmetic.evaluate(self.sigma_1, z) * beta_inv % P
        )
        self.proof.sigma_2_eval = (
            arithmetic.evaluate(self.sigma_2, z) * beta_inv % P
        )
        self.proof.z_1_shifted_eval = arithmetic.evaluate(self.z_poly, shifted_z)

        for w in self.widgets:
            w.compute_proof_elements(self.proof, z)

        t_eval = arithmetic.evaluate(
            self.state.quotient_large[:, : 3 * n], z
        )

        lagrange_evals = arithmetic.get_lagrange_evaluations(z, st.small_domain)
        linear_terms = compute_linear_terms(
            self.proof, self.challenges, lagrange_evals.l_1
        )

        r = fr.add(
            fr.mul_by_constant(self.z_poly, linear_terms.z_1),
            fr.mul_by_constant(
                self.sigma_3, linear_terms.sigma_3 * beta_inv % P
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
        opening = fr.add(
            q[:, :n],
            fr.add(
                fr.mul_by_constant(q[:, n : 2 * n], z_pow_n),
                fr.mul_by_constant(q[:, 2 * n : 3 * n], z_pow_2n),
            ),
        )
        from .widgets import arithmetic_linear_combo

        opening = fr.add(
            opening,
            arithmetic_linear_combo(
                [
                    (self.r_poly, nu_pow[0]),
                    (self.w_l, nu_pow[1]),
                    (self.w_r, nu_pow[2]),
                    (self.w_o, nu_pow[3]),
                    (self.sigma_1, nu_pow[4] * beta_inv % P),
                    (self.sigma_2, nu_pow[5] * beta_inv % P),
                ]
            ),
        )
        shifted_opening = fr.mul_by_constant(self.z_poly, nu_pow[6])

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
                shifted_opening = fr.add(
                    shifted_opening, fr.mul_by_constant(wire, nu_base)
                )
                nu_base = nu_base * nu % P

        for w in self.widgets:
            opening, nu_base = w.compute_opening_poly_contribution(
                opening, nu_base, nu
            )

        shifted_z = z * st.small_domain.root % P
        opening_w, _ = arithmetic.compute_kate_opening_coefficients(opening, z)
        shifted_w, _ = arithmetic.compute_kate_opening_coefficients(
            shifted_opening, shifted_z
        )
        (
            self.proof.pi_z_commitment,
            self.proof.pi_z_omega_commitment,
        ) = self.commit_batch([opening_w, shifted_w])

    # ------------------------------------------------------------------
    def construct_proof(self) -> Proof:
        """(prover.cpp:661-670)."""
        small = self.state.small_domain
        self.sigma_1 = compute_permutation_lagrange_base(self.sigma_1_mapping, small)
        self.sigma_2 = compute_permutation_lagrange_base(self.sigma_2_mapping, small)
        self.sigma_3 = compute_permutation_lagrange_base(self.sigma_3_mapping, small)
        self.compute_wire_coefficients()
        self.compute_wire_commitments()
        self.compute_z_coefficients()
        self.compute_z_commitment()
        self.compute_quotient_polynomial()
        self.compute_quotient_commitment()
        self.compute_opening_elements()
        return self.proof
