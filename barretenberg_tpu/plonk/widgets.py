"""PLONK selector widgets.

Reference: waffle/proof_system/widgets/. A prover widget contributes its gate
constraint to the quotient polynomial (in coset-evaluation form), its
linearization terms to r(X), and its preprocessed selector commitments; the
matching verifier widget reconstructs the same contributions from scalars.

Device layout: selector polynomials are (18, n) limb arrays; evaluation form
on construction (as filled by the composer), converted to coefficient form
during quotient computation (mirroring the in-place iffts of
arithmetic_widget.cpp:68-72).
"""

from __future__ import annotations

from ..fields import fr
from ..polynomials import arithmetic, fft
from ..utils import host_curve

P = fr.p

# Shifted-wire dependency flags (base_widget.hpp:20-34)
REQUIRES_W_L_SHIFTED = "w_l_shifted"
REQUIRES_W_R_SHIFTED = "w_r_shifted"
REQUIRES_W_O_SHIFTED = "w_o_shifted"


class ProverArithmeticWidget:
    """Standard PLONK gate: q_m.w_l.w_r + q_l.w_l + q_r.w_r + q_o.w_o + q_c
    (reference: widgets/arithmetic_widget.cpp)."""

    dependencies = frozenset()

    def __init__(self, q_m, q_l, q_r, q_o, q_c):
        # evaluation form (18, n)
        self.q_m, self.q_l, self.q_r, self.q_o, self.q_c = q_m, q_l, q_r, q_o, q_c
        self._coeff = None  # coefficient forms, set during quotient phase

    def compute_quotient_contribution(self, alpha_base: int, alpha: int, state) -> int:
        """Adds the gate constraint over the mid (2n) coset domain into
        state.quotient_mid (arithmetic_widget.cpp:66-100)."""
        small, mid = state.small_domain, state.mid_domain
        coeffs = [fft.ifft(q, small) for q in (self.q_m, self.q_l, self.q_r, self.q_o, self.q_c)]
        self._coeff = coeffs
        ffts = [
            fft.coset_fft_with_constant(state.pad(c, mid.size), mid, alpha_base)
            for c in coeffs
        ]
        q_m_fft, q_l_fft, q_r_fft, q_o_fft, q_c_fft = ffts
        w_l2 = state.w_l_fft[:, ::2]
        w_r2 = state.w_r_fft[:, ::2]
        w_o2 = state.w_o_fft[:, ::2]
        t = fr.mont_mul(fr.mont_mul(w_l2, q_m_fft), w_r2)
        t = fr.add(t, fr.mont_mul(w_l2, q_l_fft))
        t = fr.add(t, fr.mont_mul(w_r2, q_r_fft))
        t = fr.add(t, fr.mont_mul(w_o2, q_o_fft))
        t = fr.add(t, q_c_fft)
        state.quotient_mid = fr.add(state.quotient_mid, t)
        return alpha_base * alpha % P

    def compute_linear_contribution(self, alpha_base: int, alpha: int, proof, r):
        """r += (q_m.wl_eval.wr_eval + q_l.wl + q_r.wr + q_o.wo + q_c).alpha_base
        in coefficient form (arithmetic_widget.cpp:102-122)."""
        q_m, q_l, q_r, q_o, q_c = self._coeff
        w_lr = proof.w_l_eval * proof.w_r_eval % P
        t = arithmetic_linear_combo(
            [
                (q_m, w_lr * alpha_base % P),
                (q_l, proof.w_l_eval * alpha_base % P),
                (q_r, proof.w_r_eval * alpha_base % P),
                (q_o, proof.w_o_eval * alpha_base % P),
                (q_c, alpha_base),
            ]
        )
        return alpha_base * alpha % P, fr.add(r, t)

    def compute_opening_poly_contribution(self, opening_poly, nu_base: int, nu: int):
        return opening_poly, nu_base  # arithmetic widget adds nothing

    def compute_proof_elements(self, proof, z: int) -> None:
        return None

    def compute_preprocessed_commitments(self, prover) -> "VerifierArithmeticWidget":
        """5 selector commitments (arithmetic_widget.cpp:124-157)."""
        small = prover.state.small_domain
        commitments = [
            prover.commit(fft.ifft(q, small))
            for q in (self.q_m, self.q_l, self.q_r, self.q_o, self.q_c)
        ]
        return VerifierArithmeticWidget(commitments)


def arithmetic_linear_combo(terms):
    """sum_i poly_i * scalar_i for host-int scalars, device polys."""
    acc = None
    for poly, scalar in terms:
        t = fr.mul_by_constant(poly, scalar % P)
        acc = t if acc is None else fr.add(acc, t)
    return acc


class ProverBoolWidget:
    """Booleanity constraint (w^2 - w).q_b per wire column
    (reference: widgets/bool_widget.cpp:62-100)."""

    dependencies = frozenset()

    def __init__(self, q_bl, q_br, q_bo):
        self.q_bl, self.q_br, self.q_bo = q_bl, q_br, q_bo  # evaluation form
        self._coeff = None

    def compute_quotient_contribution(self, alpha_base: int, alpha: int, state) -> int:
        small, mid = state.small_domain, state.mid_domain
        coeffs = [fft.ifft(q, small) for q in (self.q_bl, self.q_br, self.q_bo)]
        self._coeff = coeffs
        scales = [alpha_base, alpha_base * alpha % P, alpha_base * alpha * alpha % P]
        ffts = [
            fft.coset_fft_with_constant(state.pad(c, mid.size), mid, s)
            for c, s in zip(coeffs, scales)
        ]
        t = None
        for wire_fft, q_fft in zip(
            (state.w_l_fft, state.w_r_fft, state.w_o_fft), ffts
        ):
            w2 = wire_fft[:, ::2]
            term = fr.mont_mul(fr.sub(fr.mont_mul(w2, w2), w2), q_fft)
            t = term if t is None else fr.add(t, term)
        state.quotient_mid = fr.add(state.quotient_mid, t)
        return alpha_base * pow(alpha, 3, P) % P

    def compute_linear_contribution(self, alpha_base: int, alpha: int, proof, r):
        """(bool_widget.cpp:105-124)."""
        muls = []
        for ev, k in (
            (proof.w_l_eval, alpha_base),
            (proof.w_r_eval, alpha_base * alpha % P),
            (proof.w_o_eval, alpha_base * alpha * alpha % P),
        ):
            muls.append((ev * ev - ev) % P * k % P)
        t = arithmetic_linear_combo(list(zip(self._coeff, muls)))
        return alpha_base * pow(alpha, 3, P) % P, fr.add(r, t)

    def compute_opening_poly_contribution(self, opening_poly, nu_base: int, nu: int):
        return opening_poly, nu_base

    def compute_proof_elements(self, proof, z: int) -> None:
        return None

    def compute_preprocessed_commitments(self, prover) -> "VerifierBoolWidget":
        small = prover.state.small_domain
        commitments = [
            prover.commit(fft.ifft(q, small))
            for q in (self.q_bl, self.q_br, self.q_bo)
        ]
        return VerifierBoolWidget(commitments)


class VerifierBoolWidget:
    dependencies = frozenset()

    def __init__(self, commitments):
        self.commitments = commitments  # [Q_BL, Q_BR, Q_BO]

    def verify_instance_commitments(self) -> bool:
        return all(
            c == (0, 0) or host_curve.g1_is_on_curve(c) for c in self.commitments
        )

    def compute_batch_evaluation_contribution(self, batch_eval, nu_base, nu, proof):
        return batch_eval, nu_base

    def append_scalar_multiplication_inputs(self, coeffs, proof, points, scalars):
        """(bool_widget.cpp:194-230)."""
        ab, a_step, ln = coeffs["alpha_base"], coeffs["alpha_step"], coeffs["linear_nu"]
        muls = [
            (proof.w_l_eval**2 - proof.w_l_eval) % P * ab % P * ln % P,
            (proof.w_r_eval**2 - proof.w_r_eval) % P * ab % P * a_step % P * ln % P,
            (proof.w_o_eval**2 - proof.w_o_eval)
            % P
            * ab
            % P
            * a_step
            % P
            * a_step
            % P
            * ln
            % P,
        ]
        for pt, sc in zip(self.commitments, muls):
            if pt != (0, 0) and host_curve.g1_is_on_curve(pt):
                points.append(pt)
                scalars.append(sc)
        out = dict(coeffs)
        out["alpha_base"] = ab * pow(a_step, 3, P) % P
        return out


class ProverSequentialWidget:
    """q_oo selector multiplying the next gate's output w_o(X.omega)
    (reference: widgets/sequential_widget.cpp:47-74). Shares the arithmetic
    widget's alpha power (old_alpha = alpha_base / alpha)."""

    dependencies = frozenset((REQUIRES_W_O_SHIFTED,))

    def __init__(self, q_o_next):
        self.q_o_next = q_o_next  # evaluation form
        self._coeff = None

    def compute_quotient_contribution(self, alpha_base: int, alpha: int, state) -> int:
        small, mid = state.small_domain, state.mid_domain
        old_alpha = alpha_base * pow(alpha, -1, P) % P
        self._coeff = fft.ifft(self.q_o_next, small)
        q_fft = fft.coset_fft_with_constant(
            state.pad(self._coeff, mid.size), mid, old_alpha
        )
        import jax.numpy as jnp

        w_o_shifted = jnp.roll(state.w_o_fft, -4, axis=1)[:, ::2]
        state.quotient_mid = fr.add(
            state.quotient_mid, fr.mont_mul(w_o_shifted, q_fft)
        )
        return alpha_base

    def compute_linear_contribution(self, alpha_base: int, alpha: int, proof, r):
        old_alpha = alpha_base * pow(alpha, -1, P) % P
        t = fr.mul_by_constant(
            self._coeff, proof.w_o_shifted_eval * old_alpha % P
        )
        return alpha_base, fr.add(r, t)

    def compute_opening_poly_contribution(self, opening_poly, nu_base: int, nu: int):
        return opening_poly, nu_base

    def compute_proof_elements(self, proof, z: int) -> None:
        return None

    def compute_preprocessed_commitments(self, prover) -> "VerifierSequentialWidget":
        small = prover.state.small_domain
        return VerifierSequentialWidget(
            [prover.commit(fft.ifft(self.q_o_next, small))]
        )


class VerifierSequentialWidget:
    dependencies = frozenset((REQUIRES_W_O_SHIFTED,))

    def __init__(self, commitments):
        self.commitments = commitments  # [Q_O_NEXT]

    def verify_instance_commitments(self) -> bool:
        c = self.commitments[0]
        return c == (0, 0) or host_curve.g1_is_on_curve(c)

    def compute_batch_evaluation_contribution(self, batch_eval, nu_base, nu, proof):
        return batch_eval, nu_base

    def append_scalar_multiplication_inputs(self, coeffs, proof, points, scalars):
        """(sequential_widget.cpp:122-147)."""
        old_alpha = coeffs["alpha_base"] * pow(coeffs["alpha_step"], -1, P) % P
        sc = proof.w_o_shifted_eval * old_alpha % P * coeffs["linear_nu"] % P
        pt = self.commitments[0]
        if pt != (0, 0) and host_curve.g1_is_on_curve(pt):
            points.append(pt)
            scalars.append(sc)
        return dict(coeffs)


class ProverMiMCWidget:
    """MiMC round gate over the 4n domain with shifted w_o
    (reference: widgets/mimc_widget.cpp:58-93):
    q_mimc.(((w_o+w_l+q_mimc_c)^3 - w_r) + alpha.((w_o+w_l+q_mimc_c).w_r^2 - w_o_next))
    """

    dependencies = frozenset((REQUIRES_W_O_SHIFTED,))

    def __init__(self, q_mimc_selector, q_mimc_coefficient):
        self.q_mimc_selector = q_mimc_selector  # evaluation form
        self.q_mimc_coefficient = q_mimc_coefficient
        self._sel_coeff = None
        self._coef_coeff = None

    def compute_quotient_contribution(self, alpha_base: int, alpha: int, state) -> int:
        small, large = state.small_domain, state.large_domain
        self._sel_coeff = fft.ifft(self.q_mimc_selector, small)
        self._coef_coeff = fft.ifft(self.q_mimc_coefficient, small)
        sel_fft = fft.coset_fft_with_constant(
            state.pad(self._sel_coeff, large.size), large, alpha_base
        )
        coef_fft = fft.coset_fft(state.pad(self._coef_coeff, large.size), large)
        import jax.numpy as jnp

        w_o_next = jnp.roll(state.w_o_fft, -4, axis=1)
        t0 = fr.add(fr.add(state.w_o_fft, state.w_l_fft), coef_fft)
        t1 = fr.sub(fr.mont_mul(fr.mont_mul(t0, t0), t0), state.w_r_fft)
        t2 = fr.sub(
            fr.mont_mul(fr.mont_mul(state.w_r_fft, state.w_r_fft), t0), w_o_next
        )
        t1 = fr.add(t1, fr.mul_by_constant(t2, alpha))
        state.quotient_large = fr.add(
            state.quotient_large, fr.mont_mul(t1, sel_fft)
        )
        return alpha_base * alpha % P * alpha % P

    def compute_proof_elements(self, proof, z: int) -> None:
        proof.q_mimc_coefficient_eval = arithmetic.evaluate(self._coef_coeff, z)

    def compute_linear_contribution(self, alpha_base: int, alpha: int, proof, r):
        """(mimc_widget.cpp:96-113)."""
        t0 = (proof.w_o_eval + proof.w_l_eval + proof.q_mimc_coefficient_eval) % P
        a = (t0 * t0 % P * t0 - proof.w_r_eval) % P
        term = (
            (proof.w_r_eval * proof.w_r_eval % P * t0 - proof.w_o_shifted_eval)
            % P
            * alpha
            % P
        )
        mimc_term = (term + a) % P * alpha_base % P
        t = fr.mul_by_constant(self._sel_coeff, mimc_term)
        return alpha_base * alpha % P * alpha % P, fr.add(r, t)

    def compute_opening_poly_contribution(self, opening_poly, nu_base: int, nu: int):
        """opening += q_mimc_coefficient . nu_base (mimc_widget.cpp:115-124)."""
        out = fr.add(opening_poly, fr.mul_by_constant(self._coef_coeff, nu_base))
        return out, nu_base * nu % P

    def compute_preprocessed_commitments(self, prover) -> "VerifierMiMCWidget":
        small = prover.state.small_domain
        return VerifierMiMCWidget(
            [
                prover.commit(fft.ifft(self.q_mimc_coefficient, small)),
                prover.commit(fft.ifft(self.q_mimc_selector, small)),
            ]
        )


class VerifierMiMCWidget:
    dependencies = frozenset((REQUIRES_W_O_SHIFTED,))

    def __init__(self, commitments):
        self.commitments = commitments  # [Q_MIMC_COEFFICIENT, Q_MIMC_SELECTOR]

    def verify_instance_commitments(self) -> bool:
        return all(
            c == (0, 0) or host_curve.g1_is_on_curve(c) for c in self.commitments
        )

    def compute_batch_evaluation_contribution(self, batch_eval, nu_base, nu, proof):
        """(mimc_widget.cpp:173-179)."""
        batch_eval = (batch_eval + proof.q_mimc_coefficient_eval * nu_base) % P
        return batch_eval, nu_base * nu % P

    def append_scalar_multiplication_inputs(self, coeffs, proof, points, scalars):
        """(mimc_widget.cpp:181-216)."""
        ab, a_step, ln = coeffs["alpha_base"], coeffs["alpha_step"], coeffs["linear_nu"]
        pt = self.commitments[0]
        if pt != (0, 0) and host_curve.g1_is_on_curve(pt):
            points.append(pt)
            scalars.append(coeffs["nu_base"])
        t0 = (proof.w_o_eval + proof.w_l_eval + proof.q_mimc_coefficient_eval) % P
        a = (t0 * t0 % P * t0 - proof.w_r_eval) % P
        term = (
            (proof.w_r_eval * proof.w_r_eval % P * t0 - proof.w_o_shifted_eval)
            % P
            * a_step
            % P
        )
        q_mimc_term = (term + a) % P * ab % P * ln % P
        pt = self.commitments[1]
        if pt != (0, 0) and host_curve.g1_is_on_curve(pt):
            points.append(pt)
            scalars.append(q_mimc_term)
        out = dict(coeffs)
        out["alpha_base"] = ab * a_step % P * a_step % P
        out["nu_base"] = coeffs["nu_base"] * coeffs["nu_step"] % P
        return out


class VerifierArithmeticWidget:
    dependencies = frozenset()

    def __init__(self, commitments):
        # [Q_M, Q_L, Q_R, Q_O, Q_C] host (x, y) points
        self.commitments = commitments

    def verify_instance_commitments(self) -> bool:
        return all(host_curve.g1_is_on_curve(c) for c in self.commitments)

    def compute_batch_evaluation_contribution(
        self, batch_eval: int, nu_base: int, nu: int, proof
    ):
        return batch_eval, nu_base  # no extra evaluations in the proof

    def append_scalar_multiplication_inputs(
        self, coeffs, proof, points: list, scalars: list
    ):
        """(arithmetic_widget.cpp:186-246). coeffs: dict with alpha_base,
        alpha_step, nu_base, nu_step, linear_nu."""
        ab, ln = coeffs["alpha_base"], coeffs["linear_nu"]
        q_m_term = proof.w_l_eval * proof.w_r_eval % P * ab % P * ln % P
        q_l_term = proof.w_l_eval * ab % P * ln % P
        q_r_term = proof.w_r_eval * ab % P * ln % P
        q_o_term = proof.w_o_eval * ab % P * ln % P
        q_c_term = ab * ln % P
        for pt, sc in zip(
            self.commitments, (q_m_term, q_l_term, q_r_term, q_o_term, q_c_term)
        ):
            if pt is not None and host_curve.g1_is_on_curve(pt):
                points.append(pt)
                scalars.append(sc)
        out = dict(coeffs)
        out["alpha_base"] = ab * coeffs["alpha_step"] % P
        return out
