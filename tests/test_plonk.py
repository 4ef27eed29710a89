"""End-to-end PLONK tests: transcript, SRS, prover internals, prove+verify.

Mirrors the reference's test strategy (test_prover.cpp's random satisfiable
fixture, test_verifier.cpp's full round trip) at reduced sizes for CPU CI.
"""

import numpy as np
import pytest

from barretenberg_tpu.fields import fr
from barretenberg_tpu.plonk import Prover, preprocess
from barretenberg_tpu.plonk.widgets import ProverArithmeticWidget
from barretenberg_tpu.srs import test_srs as make_srs
from barretenberg_tpu.transcript.keccak import keccak256
from barretenberg_tpu.utils import host_curve

P = fr.p


# ---------------------------------------------------------------------------
# keccak / transcript
# ---------------------------------------------------------------------------
def test_keccak256_known_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block message (> 136-byte rate)
    assert keccak256(b"a" * 200) == keccak256(b"a" * 100 + b"a" * 100)


# ---------------------------------------------------------------------------
# SRS
# ---------------------------------------------------------------------------
def test_srs_generation_consistency():
    srs = make_srs(8)
    pts = srs.monomials_host()
    tau = 0xA11CE % fr.p
    assert pts[0] == host_curve.G1_GENERATOR
    for i in range(1, 8):
        assert pts[i] == host_curve.g1_mul(host_curve.G1_GENERATOR, pow(tau, i, fr.p))
    assert host_curve.g2_is_on_curve(srs.g2_x)


def test_srs_pairing_check():
    assert make_srs(8).srs_pairing_check()


def test_srs_file_roundtrip(tmp_path):
    from barretenberg_tpu.srs import ReferenceString

    srs = make_srs(8)
    pts = srs.monomials_host()
    path = str(tmp_path / "transcript.dat")
    ReferenceString.save(path, pts[1:], srs.g2_x)
    loaded = ReferenceString.load(path, 8)
    assert loaded.monomials_host() == pts
    assert loaded.g2_x == srs.g2_x


# ---------------------------------------------------------------------------
# Prover fixture (test_prover.cpp:73-162's random satisfiable circuit)
# ---------------------------------------------------------------------------
def build_fixture_prover(n: int, seed: int = 7, srs=None) -> Prover:
    rng = np.random.default_rng(seed)

    def rand():
        return int.from_bytes(rng.bytes(32), "little") % P

    w_l = [0] * n
    w_r = [0] * n
    w_o = [0] * n
    q_m = [0] * n
    q_l = [0] * n
    q_r = [0] * n
    q_o = [0] * n
    q_c = [0] * n
    for i in range(n // 4):
        # even gates: w_o = w_l.w_r + w_l + w_r + 1
        w_l[2 * i] = rand()
        w_r[2 * i] = rand()
        w_o[2 * i] = (
            w_l[2 * i] * w_r[2 * i] + w_l[2 * i] + w_r[2 * i] + 1
        ) % P
        q_m[2 * i] = 1
        q_l[2 * i] = 1
        q_r[2 * i] = 1
        q_o[2 * i] = P - 1
        q_c[2 * i] = 1
        # odd gates: q_c = -(w_l + w_r + w_o)
        w_l[2 * i + 1] = rand()
        w_r[2 * i + 1] = rand()
        w_o[2 * i + 1] = rand()
        q_c[2 * i + 1] = (-(w_l[2 * i + 1] + w_r[2 * i + 1] + w_o[2 * i + 1])) % P
        q_l[2 * i + 1] = 1
        q_r[2 * i + 1] = 1
        q_o[2 * i + 1] = 1

    shift = n // 2
    for arr in (w_l, w_r, w_o, q_m, q_l, q_r, q_o, q_c):
        arr[shift:] = arr[:shift]

    s1 = np.zeros(n, dtype=np.uint32)
    s2 = np.zeros(n, dtype=np.uint32)
    s3 = np.zeros(n, dtype=np.uint32)
    for i in range(shift):
        s1[shift + i] = i
        s2[shift + i] = i + (1 << 30)
        s3[shift + i] = i + (1 << 31)
        s1[i] = i + shift
        s2[i] = i + shift + (1 << 30)
        s3[i] = i + shift + (1 << 31)
    for j in (shift - 1, n - 1):
        s1[j] = j
        s2[j] = j + (1 << 30)
        s3[j] = j + (1 << 31)
    for j in (shift - 1, n - 1):
        w_l[j] = w_r[j] = w_o[j] = 0
        q_c[j] = 0
    q_l[n - 1] = q_r[n - 1] = q_o[n - 1] = q_m[n - 1] = 0

    prover = Prover(n, srs if srs is not None else make_srs(n))
    prover.w_l = fr.encode(w_l)
    prover.w_r = fr.encode(w_r)
    prover.w_o = fr.encode(w_o)
    prover.sigma_1_mapping = s1
    prover.sigma_2_mapping = s2
    prover.sigma_3_mapping = s3
    prover.widgets.append(
        ProverArithmeticWidget(
            fr.encode(q_m), fr.encode(q_l), fr.encode(q_r),
            fr.encode(q_o), fr.encode(q_c),
        )
    )
    return prover


def test_quotient_polynomial_degree():
    """quotient_large must vanish above 3n (test_prover.cpp:165-182)."""
    from barretenberg_tpu.plonk.permutation import (
        compute_permutation_lagrange_base,
    )

    n = 16
    prover = build_fixture_prover(n)
    small = prover.state.small_domain
    prover.sigma_1 = compute_permutation_lagrange_base(prover.sigma_1_mapping, small)
    prover.sigma_2 = compute_permutation_lagrange_base(prover.sigma_2_mapping, small)
    prover.sigma_3 = compute_permutation_lagrange_base(prover.sigma_3_mapping, small)
    prover.compute_wire_coefficients()
    prover.compute_wire_commitments()
    prover.compute_z_coefficients()
    prover.compute_z_commitment()
    prover.compute_quotient_polynomial()
    tail = fr.decode(prover.state.quotient_large[:, 3 * n :])
    assert all(v == 0 for v in tail)


def test_prove_and_verify_fixture():
    n = 16
    prover = build_fixture_prover(n)
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert verifier.verify_proof(proof)


def test_golden_proof_digest():
    """Pins the full proof byte serialization for the fixed-seed n=16
    fixture. Any silent change to limb encoding, Fiat-Shamir buffer layout,
    commitment math, or the prover's round structure changes this digest
    (SURVEY.md section 7.2 step 7's bit-exactness gate)."""
    from barretenberg_tpu.transcript.keccak import keccak256

    prover = build_fixture_prover(16, seed=7)
    proof = prover.construct_proof()
    blob = proof.serialize()
    assert len(blob) == 800
    assert (
        keccak256(blob).hex()
        == "f9b1f779dea05d9cd75e1e34e69dc3ca20b1b131044e767a52f68a9feb50a990"
    )


def test_native_keccak_matches_python_oracle():
    import os

    from barretenberg_tpu.transcript import keccak as K

    if K._native_keccak is None:
        import pytest

        pytest.skip("native keccak unavailable")
    rng = os.urandom
    for size in (0, 1, 135, 136, 137, 500):
        d = rng(size)
        assert K._native_keccak(d) == K._keccak256_py(d)


def test_tampered_proof_rejected():
    n = 16
    prover = build_fixture_prover(n, seed=11)
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    proof.w_l_eval = (proof.w_l_eval + 1) % P
    assert not verifier.verify_proof(proof)


def test_staged_quotient_path_bit_identical(monkeypatch):
    """The staged (per-transform) quotient phase used at n >= 2^17 on TPU
    must produce byte-identical proofs to the monolithic fused graph."""
    base = build_fixture_prover(16, seed=7).construct_proof().serialize()
    monkeypatch.setattr(Prover, "_STAGED_QUOTIENT_MIN_N", 1)
    staged = build_fixture_prover(16, seed=7).construct_proof().serialize()
    assert staged == base
