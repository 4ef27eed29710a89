"""ExtendedComposer: gate-count optimizer using the 4th virtual wire.

Reference: waffle/composer/extended_composer.cpp:157-463. Adjacent gate
pairs that share an eliminable intermediate wire are merged into one "quad"
row whose constraint also references the NEXT row's output wire through the
sequential widget's q_oo selector (sequential_widget.cpp:47-63):

    q_m.wl.wr + q_l.wl + q_r.wr + q_o.wo + q_oo.wo(next row) + q_c = 0

This implementation uses a conservative merge rule (a strict subset of the
reference's, which also performs anchoring rewrites between adjacent quads):

  * gate i+1 is linear (q_m == 0) and shares exactly one variable v with
    gate i;
  * v is isolated (used nowhere else), not boolean-constrained, and does
    not feed gate i's multiplicative term;
  * one of the merged row's wires u also appears in gate i+2, where it can
    occupy (or be swapped into) the output slot.

Then v is eliminated by the linear combination c2*(gate i) - c1*(gate i+1),
gate i+1 is deleted, and u is read through w_o(X.omega). Sigma permutations
are rebuilt from the compacted wire arrays.
"""

from __future__ import annotations

from ..fields import fr
from ..plonk.prover import Prover
from ..plonk.widgets import ProverSequentialWidget
from .bool import BoolComposer

P = fr.p


class ExtendedComposer(BoolComposer):
    def __init__(self):
        super().__init__()
        self.q_oo: list[int] = []
        self.merged_count = 0
        self._no_merge_from: int | None = None

    def create_dummy_gates(self) -> None:
        self._no_merge_from = self.n
        super().create_dummy_gates()

    # ------------------------------------------------------------------
    def _wire_positions(self, gate: int, v: int) -> list[str]:
        out = []
        if self.w_l[gate] == v:
            out.append("l")
        if self.w_r[gate] == v:
            out.append("r")
        if self.w_o[gate] == v:
            out.append("o")
        return out

    def _coeff(self, gate: int, pos: str) -> int:
        return {"l": self.q_l, "r": self.q_r, "o": self.q_o}[pos][gate]

    def _gate_wires(self, gate: int) -> list[tuple[int, str]]:
        return [
            (self.w_l[gate], "l"),
            (self.w_r[gate], "r"),
            (self.w_o[gate], "o"),
        ]

    def _is_isolated(self, v: int, g1: int, g2: int) -> bool:
        return all(g in (g1, g2) for g, _ in self.wire_epicycles[v])

    def _combine_linear_relations(self, zero_idx: int) -> None:
        """(extended_composer.cpp:157-427, conservative subset)."""
        n_user = self._no_merge_from if self._no_merge_from is not None else self.n
        self.q_oo = [0] * self.n
        deleted = [False] * self.n
        w_o_locked = [False] * self.n

        i = 0
        while i + 2 < n_user:
            g1, g2, g3 = i, i + 1, i + 2
            i += 1
            if deleted[g1] or self.q_m[g2] != 0:
                continue
            # exactly one shared, isolated, non-bool variable
            shared = [
                v
                for v, _ in self._gate_wires(g1)
                if v in (self.w_l[g2], self.w_r[g2], self.w_o[g2])
            ]
            shared = list(dict.fromkeys(shared))
            if len(shared) != 1:
                continue
            v = shared[0]
            if v == zero_idx or self.is_bool[v] or not self._is_isolated(v, g1, g2):
                continue
            p1s = self._wire_positions(g1, v)
            p2s = self._wire_positions(g2, v)
            if len(p1s) != 1 or len(p2s) != 1:
                continue
            p1, p2 = p1s[0], p2s[0]
            if self.q_m[g1] != 0 and p1 in ("l", "r"):
                continue  # v feeds the multiplicative term
            c1 = self._coeff(g1, p1)
            c2 = self._coeff(g2, p2)
            if c1 == 0 or c2 == 0:
                continue

            # combined coefficients: c2*(gate1) - c1*(gate2)
            coeffs: dict[int, int] = {}
            for w, pos in self._gate_wires(g1):
                if pos == p1 and w == v:
                    continue
                coeffs[w] = (coeffs.get(w, 0) + c2 * self._coeff(g1, pos)) % P
            for w, pos in self._gate_wires(g2):
                if pos == p2 and w == v:
                    continue
                coeffs[w] = (coeffs.get(w, 0) - c1 * self._coeff(g2, pos)) % P
            q_m_new = c2 * self.q_m[g1] % P
            q_c_new = (c2 * self.q_c[g1] - c1 * self.q_c[g2]) % P

            # slot assignment
            if q_m_new != 0:
                slot_l, slot_r = self.w_l[g1], self.w_r[g1]
                rest = [w for w in coeffs if w not in (slot_l, slot_r)]
                if len(rest) > 2:
                    continue
            else:
                rest = list(coeffs)
                if len(rest) > 4:
                    continue
                slot_l = slot_r = None

            # find the lookahead wire u among candidates for the o_next slot
            def try_place(candidates):
                for u in candidates:
                    if u == zero_idx:
                        continue
                    if u == self.w_o[g3]:
                        return u, None
                    if w_o_locked[g3] or self.q_m[g3] != 0:
                        continue
                    if u == self.w_l[g3]:
                        return u, "l"
                    if u == self.w_r[g3]:
                        return u, "r"
                return None, None

            u, swap = try_place(rest)
            if u is None:
                continue

            # perform the g3 swap (linear gate, so slots are symmetric)
            if swap == "l":
                self.w_l[g3], self.w_o[g3] = self.w_o[g3], self.w_l[g3]
                self.q_l[g3], self.q_o[g3] = self.q_o[g3], self.q_l[g3]
            elif swap == "r":
                self.w_r[g3], self.w_o[g3] = self.w_o[g3], self.w_r[g3]
                self.q_r[g3], self.q_o[g3] = self.q_o[g3], self.q_r[g3]
            w_o_locked[g3] = True

            remaining = [w for w in rest if w != u]
            if q_m_new is not None and q_m_new != 0:
                slot_o = remaining[0] if remaining else zero_idx
            else:
                pads = [zero_idx] * (3 - len(remaining))
                slot_l, slot_r, slot_o = (remaining + pads)[:3]

            # write the quad row at g1, delete g2
            self.w_l[g1], self.w_r[g1], self.w_o[g1] = slot_l, slot_r, slot_o
            self.q_m[g1] = q_m_new
            self.q_l[g1] = coeffs.get(slot_l, 0) if slot_l != zero_idx else 0
            self.q_r[g1] = coeffs.get(slot_r, 0) if slot_r != zero_idx else 0
            self.q_o[g1] = coeffs.get(slot_o, 0) if slot_o != zero_idx else 0
            # duplicate slots would double-count: guard by zeroing repeats
            seen = set()
            for slot, q_arr in (("w_l", self.q_l), ("w_r", self.q_r), ("w_o", self.q_o)):
                w = getattr(self, slot)[g1]
                if w in seen and w != zero_idx:
                    q_arr[g1] = 0
                seen.add(w)
            self.q_c[g1] = q_c_new
            self.q_oo[g1] = coeffs.get(u, 0)
            deleted[g2] = True
            self.merged_count += 1
            i += 2  # skip past the deleted gate and the lookahead gate

        # compact the arrays and rebuild the permutation bookkeeping
        keep = [g for g in range(self.n) if not deleted[g]]
        remap = {old: new for new, old in enumerate(keep)}
        if hasattr(self, "_forced_bool_gate"):
            self._forced_bool_gate = remap[self._forced_bool_gate]
        for name in ("w_l", "w_r", "w_o", "q_m", "q_l", "q_r", "q_o", "q_c", "q_oo"):
            arr = getattr(self, name)
            setattr(self, name, [arr[g] for g in keep])
        self.n = len(keep)
        for cycles in self.wire_epicycles:
            cycles.clear()
        from .base import LEFT, OUTPUT, RIGHT

        for g in range(self.n):
            self.wire_epicycles[self.w_l[g]].append((g, LEFT))
            self.wire_epicycles[self.w_r[g]].append((g, RIGHT))
            self.wire_epicycles[self.w_o[g]].append((g, OUTPUT))

    # ------------------------------------------------------------------
    def preprocess(self, reference_string=None) -> Prover:
        """(extended_composer.cpp:464+): merge, then standard preprocess
        with Arithmetic + Bool + Sequential widgets."""
        if not hasattr(self, "_forced_bool_gate"):
            self.create_dummy_gates()
        zero_idx = self.add_variable(0)
        self._combine_linear_relations(zero_idx)
        user_n = self.n
        prover = super().preprocess(reference_string)
        q_oo = self.q_oo + [0] * (prover.n - user_n)
        # the sequential widget shares the arithmetic widget's alpha power
        # (old_alpha = alpha_base / alpha), so it must come directly after it
        # (extended_composer.cpp:696-700's widget order)
        prover.widgets.insert(1, ProverSequentialWidget(fr.encode(q_oo)))
        return prover
