"""Pairing tests: reference KAT + bilinearity (host-only, no device work).

KAT constants from /root/reference/test/test_pairing.cpp:12-28 (raw,
pre-Montgomery limb values). The reference stores Fq12 in the
Fq2->Fq6->Fq12 tower basis; ours is the flat Fq[w]/(w^12-18w^6+82) basis -
`tower_to_flat` maps between them (w_tower = w_flat, u = w^6 - 9).
"""

import numpy as np

from barretenberg_tpu.fields import fr
from barretenberg_tpu.pairing import host as ph
from barretenberg_tpu.utils import host_curve as hc


def limbs(*ws):
    v = 0
    for j, w in enumerate(ws):
        v |= w << (64 * j)
    return v


def tower_to_flat(tower):
    """tower: [[ (x,y) fq2 ] * 3 ] * 2 -> flat 12-tuple."""
    flat = [0] * 12
    for i in range(2):
        for j in range(3):
            x, y = tower[i][j]
            d = i + 2 * j
            flat[d] = (flat[d] + x - 9 * y) % ph.P
            flat[d + 6] = (flat[d + 6] + y) % ph.P
    return tuple(flat)


def test_reduced_ate_pairing_kat():
    P_pt = (
        limbs(0x956E256B9DB00C13, 0x66D29AC18E1B2BFF, 0x5D6F055E34402F6E, 0x5BFCBAAFF0FEB62),
        limbs(0x564099DC0EF0A96, 0xA97ECA7453F67DD2, 0x850E976B207E8C18, 0x20187F89A1D789CD),
    )
    Q_pt = (
        (
            limbs(0x3B25F1AD9A7F9CD2, 0xDDB8B066D21CE86, 0xF8A4E318ABD3CFF7, 0x1272EE5F2E7E9DC1),
            limbs(0xC7B14EA54DC1436F, 0x1F9384EB12B6941A, 0x3AFE17A00720E8E3, 0x2A171F424AB98D8),
        ),
        (
            limbs(0x890D5A50C1D88E96, 0x6AE79A7A2B439172, 0x4C120A629CED363C, 0x295BD556FE685DD),
            limbs(0xA3189C7F120D4738, 0x4416DA0DF17C8EE, 0x4CC514ACC1C2AC45, 0xB17D8F998E4EBE6),
        ),
    )
    expected_tower = [
        [
            (limbs(0xD3B91C8DC40A9B8C, 0x5C8A39A470FCB4EA, 0x763E904E585A87E7, 0x2026F0077C50AFA4),
             limbs(0xDDC69495371E5F38, 0x290BFC6512704E60, 0xC208C0F8E90BD52F, 0x2E82C92370A2F000)),
            (limbs(0xDCBC2917451B8E12, 0x183016AA113A74EB, 0x9A2FF2A059F7D14D, 0x1166FC0ED488820C),
             limbs(0x3B2C1E19E47214FF, 0x374DF83E0AC59C1A, 0x3E1C5ED4FD611CB2, 0x26179258A104DA1A)),
            (limbs(0xC948BDFF07912922, 0x3417BA2A42303918, 0x89336B54F20FF8A9, 0xB7EED88572FCAC4),
             limbs(0x85524385A79574BA, 0xE7746AD78E659D8E, 0x997E4848CC70ECA5, 0x2A9E3F37C50E6C9A)),
        ],
        [
            (limbs(0xC7EED1CA5AAA5A82, 0xEA8D1F0BE1EF0D7, 0xD7D539FD8136038A, 0x27196E24CD6D028E),
             limbs(0xCB7B6528984002E4, 0x1D3221C223E0587, 0xDA44F3E957677F97, 0x1E3DF34445CC3876)),
            (limbs(0xF3E958491C2B4C43, 0x1DBAFE473F7034B9, 0x129EFAE93FF9D8C9, 0xDEDBF49D35171B9),
             limbs(0x7DA7C99CF811A603, 0xFCB99B8309663279, 0x1D80151EF8FCDB59, 0x1B09A01856170269)),
            (limbs(0xA048B10941003960, 0x73D941C906A24CD0, 0x9C10F82A6BF78E2E, 0x13A41DBDD3D616D),
             limbs(0x31D7525FA8914A4C, 0xE1ED738718E2E8B8, 0x18305C749A9D97A2, 0x20534D878E1E9DB0)),
        ],
    ]
    assert hc.g1_is_on_curve(P_pt)
    assert hc.g2_is_on_curve(Q_pt)
    result = ph.reduced_ate_pairing(P_pt, Q_pt)
    assert result == tower_to_flat(expected_tower)


def test_tower_matches_flat_oracle():
    """Fast tower path vs the original flat-basis oracle (the reference's
    slow-vs-fast cross-check pattern)."""
    P = hc.G1_GENERATOR
    Q = hc.G2_GENERATOR
    fast = ph.reduced_ate_pairing(hc.g1_mul(P, 11), hc.g2_mul(Q, 13))
    slow = ph.reduced_ate_pairing_slow(hc.g1_mul(P, 11), hc.g2_mul(Q, 13))
    assert fast == slow


def test_cyclotomic_sqr_matches_generic():
    from barretenberg_tpu.pairing import tower as tw
    import random

    random.seed(99)

    def rand_fq2():
        return (random.randrange(tw.P), random.randrange(tw.P))

    f = (
        (rand_fq2(), rand_fq2(), rand_fq2()),
        (rand_fq2(), rand_fq2(), rand_fq2()),
    )
    # easy part of the final exp puts f in the cyclotomic subgroup
    a = tw.fq12_mul(tw.fq12_conj(f), tw.fq12_inv(f))
    a = tw.fq12_mul(a, tw.fq12_frobenius(a, 2))
    assert tw.fq12_cyclotomic_sqr(a) == tw.fq12_sqr(a)
    # and the unitary inverse really inverts there
    assert tw.fq12_mul(a, tw.fq12_conj(a)) == tw.FQ12_ONE


def test_precomputed_lines_reuse():
    from barretenberg_tpu.pairing import tower as tw

    Q = hc.G2_GENERATOR
    lines = tw.precompute_miller_lines(Q)
    got = tw.reduced_ate_pairing_batch_precomputed([hc.G1_GENERATOR], [lines])
    want = tw.reduced_ate_pairing_batch([(hc.G1_GENERATOR, Q)])
    assert got == want


def test_pairing_bilinearity():
    rng = np.random.default_rng(3)
    a = int.from_bytes(rng.bytes(32), "little") % fr.p
    b = int.from_bytes(rng.bytes(32), "little") % fr.p
    P = hc.G1_GENERATOR
    Q = hc.G2_GENERATOR
    e_ab = ph.reduced_ate_pairing(hc.g1_mul(P, a), hc.g2_mul(Q, b))
    e_ba = ph.reduced_ate_pairing(hc.g1_mul(P, b), hc.g2_mul(Q, a))
    e_1 = ph.reduced_ate_pairing(hc.g1_mul(P, a * b % fr.p), Q)
    assert e_ab == e_1 == e_ba


def test_pairing_batch_matches_product():
    P = hc.G1_GENERATOR
    Q = hc.G2_GENERATOR
    pairs = [(hc.g1_mul(P, 3), hc.g2_mul(Q, 5)), (hc.g1_mul(P, 7), Q)]
    batched = ph.reduced_ate_pairing_batch(pairs)
    singles = [ph.reduced_ate_pairing(p, q) for p, q in pairs]
    assert batched == ph.fq12_mul(singles[0], singles[1])


def test_pairing_check_identity():
    P = hc.G1_GENERATOR
    Q = hc.G2_GENERATOR
    a, b = 1234567, 7654321
    assert ph.pairing_check(
        [
            (hc.g1_neg(hc.g1_mul(P, a * b)), Q),
            (hc.g1_mul(P, a), hc.g2_mul(Q, b)),
        ]
    )
    assert not ph.pairing_check(
        [
            (hc.g1_mul(P, a * b), Q),
            (hc.g1_mul(P, a), hc.g2_mul(Q, b)),
        ]
    )
