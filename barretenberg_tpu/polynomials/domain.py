"""Evaluation domains over Fr with device twiddle tables.

Mirrors the reference's evaluation_domain (reference:
polynomials/evaluation_domain.{hpp,cpp}) but the precomputed root tables are
device arrays: one power table of the domain root (k < n/2) serves every FFT
stage as a strided slice, instead of the reference's per-round tables. The
thread bookkeeping (num_threads/thread_size) has no TPU analog - lane
parallelism is implicit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import fr


class EvaluationDomain:
    def __init__(self, size: int):
        assert size & (size - 1) == 0, "domain size must be a power of two"
        self.size = size
        self.log2_size = size.bit_length() - 1
        self.root = fr.get_root_of_unity(self.log2_size)  # host int value
        self.root_inverse = pow(self.root, -1, fr.p)
        self.domain_inverse = pow(size, -1, fr.p)
        self.generator = fr.params.multiplicative_generator  # 5
        self.generator_inverse = pow(self.generator, -1, fr.p)

    # ------------------------------------------------------------------
    # Device tables (built lazily, cached)
    # ------------------------------------------------------------------
    @staticmethod
    def _power_table(base_value: int, n: int) -> jnp.ndarray:
        """(18, n) internal-Montgomery table of base^k for k < n, as ONE
        jitted associative scan (log-depth; compiled once per n and
        persisted - the previous log-doubling loop paid ~20 distinct eager
        op-compile rounds through the remote TPU tunnel, minutes per
        process)."""
        if n == 1:
            return fr.encode([1])
        return _power_table_jit(fr.encode([base_value]), n)

    @functools.cached_property
    def twiddles(self) -> jnp.ndarray:
        """omega^k for k < n/2 (covers all forward FFT stages)."""
        return self._power_table(self.root, max(1, self.size // 2))

    @functools.cached_property
    def inverse_twiddles(self) -> jnp.ndarray:
        return self._power_table(self.root_inverse, max(1, self.size // 2))

    @functools.cached_property
    def coset_scale(self) -> jnp.ndarray:
        """g^j for j < n (coset_fft input scaling)."""
        return self._power_table(self.generator, self.size)

    @functools.cached_property
    def coset_scale_inverse(self) -> jnp.ndarray:
        return self._power_table(self.generator_inverse, self.size)

    @functools.cached_property
    def bit_reverse_indices(self) -> jnp.ndarray:
        n, bits = self.size, self.log2_size
        idx = np.arange(n, dtype=np.uint32)
        rev = np.zeros_like(idx)
        for b in range(bits):
            rev |= ((idx >> b) & 1) << (bits - 1 - b)
        return jnp.asarray(rev.astype(np.int32))

    @functools.cached_property
    def _root_vector(self) -> jnp.ndarray:
        return self._power_table(self.root, self.size)

    @functools.cached_property
    def _inverse_root_vector(self) -> jnp.ndarray:
        return self._power_table(self.root_inverse, self.size)

    def root_vector(self) -> jnp.ndarray:
        """(18, n) table of omega^k for k < n = [twiddles, -twiddles]."""
        return self._root_vector

    def inverse_root_vector(self) -> jnp.ndarray:
        """(18, n) table of omega^-k for k < n."""
        return self._inverse_root_vector

    # ------------------------------------------------------------------
    # Two-level power lookup: w^e for arbitrary e < n from two O(sqrt n)
    # tables (w^(k) for k < K and w^(K*k) for k < n/K). Replaces
    # replicating the full (18, n) root vector on every device in the
    # mesh FFT (288MB at 2^22) with ~2*sqrt(n) rows + one extra mul.
    # ------------------------------------------------------------------
    @functools.cached_property
    def _two_level_k(self) -> int:
        return 1 << ((self.log2_size + 1) // 2)

    @functools.cached_property
    def two_level_tables(self):
        k = self._two_level_k
        return (
            self._power_table(self.root, k),
            self._power_table(pow(self.root, k, fr.p), max(1, self.size // k)),
        )

    @functools.cached_property
    def two_level_tables_inverse(self):
        k = self._two_level_k
        return (
            self._power_table(self.root_inverse, k),
            self._power_table(
                pow(self.root_inverse, k, fr.p), max(1, self.size // k)
            ),
        )

    def power_lookup(self, exponents: jnp.ndarray, inverse: bool = False):
        """w^(+-e) for an int array of exponents e < n: two gathers + one
        Montgomery mul against the sqrt-size tables."""
        lo, hi = self.two_level_tables_inverse if inverse else self.two_level_tables
        k = self._two_level_k
        e = exponents.astype(jnp.int32)
        return fr.mont_mul(
            jnp.take(hi, e >> (k.bit_length() - 1), axis=1),
            jnp.take(lo, e & (k - 1), axis=1),
        )

    # ------------------------------------------------------------------
    # Bailey two-level FFT tables. The full transform of size n = n1*n2 is
    # two batches of short column FFTs (along a large-stride axis - every
    # butterfly moves blocks of >= n2 contiguous elements, so no
    # lane-granular shuffles) joined by the mid twiddle w^(k1*i2) and one
    # transpose. Used by polynomials/fft.py on TPU; the reference's
    # fft_inner_parallel (polynomial_arithmetic.cpp:129-264) achieves the
    # same cache locality with per-thread butterfly ranges.
    # ------------------------------------------------------------------
    def bailey_tables(self, inverse: bool = False):
        cache = self.__dict__.setdefault("_bailey_cache", {})
        if inverse in cache:
            return cache[inverse]
        n, log2n = self.size, self.log2_size
        log1 = log2n // 2
        n1, n2 = 1 << log1, n >> log1
        root = self.root_inverse if inverse else self.root

        def stage_tws(m: int, w_m: int):
            tbl = self._power_table(w_m, max(1, m // 2))
            out = []
            for s in range(m.bit_length() - 1):
                h = 1 << s
                out.append(tbl[:, :: m // (2 * h)][:, :h])
            return out

        def bitrev(m: int):
            bits = m.bit_length() - 1
            idx = np.arange(m, dtype=np.uint32)
            rev = np.zeros_like(idx)
            for b in range(bits):
                rev |= ((idx >> b) & 1) << (bits - 1 - b)
            return jnp.asarray(rev.astype(np.int32))

        full = self.inverse_root_vector() if inverse else self.root_vector()
        k1 = np.arange(n1, dtype=np.int64)[:, None]
        i2 = np.arange(n2, dtype=np.int64)[None, :]
        idx = ((k1 * i2) % n).astype(np.int32).reshape(-1)
        tmid = jnp.take(full, jnp.asarray(idx), axis=1)  # (18, n) flat

        tables = {
            "n1": n1,
            "n2": n2,
            "tws1": stage_tws(n1, pow(root, n2, fr.p)),
            "tws2": stage_tws(n2, pow(root, n1, fr.p)),
            "bitrev1": bitrev(n1),
            "bitrev2": bitrev(n2),
            "tmid": tmid,
        }
        if any(
            isinstance(leaf, jax.core.Tracer)
            for leaf in jax.tree_util.tree_leaves(tables)
        ):  # pragma: no cover - trace-safety guard
            raise RuntimeError(
                "bailey_tables built under a jit trace; call warm_tables "
                "(or bailey_tables) eagerly first - caching tracers would "
                "poison later calls"
            )
        tables = jax.block_until_ready(tables)
        cache[inverse] = tables
        return tables

    def warm_tables(self, inverse: bool = False, coset: bool = False) -> None:
        """Materialize the cached device tables eagerly. Must be called
        before using this domain inside a jit/shard_map trace, otherwise the
        lazily-built tables would be cached as tracers and leak."""
        self.bit_reverse_indices
        if inverse:
            self.inverse_twiddles
            self._inverse_root_vector
        else:
            self.twiddles
            self._root_vector
        if coset:
            self.coset_scale
            self.coset_scale_inverse
        # The Bailey two-level path (polynomials/fft.py::_use_bailey) kicks
        # in at size >= 2^14 on TPU; its tables MUST exist before any jitted
        # prover phase calls _fft_core under trace, or the trace-time build
        # would cache tracers (bailey_tables now refuses to).
        from .fft import _use_bailey

        if _use_bailey(self):
            self.bailey_tables(inverse)

    def coset_root_vector(self) -> jnp.ndarray:
        """(18, n) table of g * omega^k (the coset evaluation points)."""
        return fr.mul_by_constant(self.root_vector(), self.generator)


# ----------------------------------------------------------------------
# Pytree registration: EvaluationDomain is passed to jitted functions as a
# DYNAMIC argument. Its cached device tables flatten to pytree leaves (so
# they become runtime parameters of the compiled program), while the host
# scalars (size, roots, ...) ride the static aux data. Without this the
# tables were baked into every lowered graph as HLO constants - at n=2^22
# the coset-scale table alone is ~300MB of serialized program, which both
# exploded compile times and overflowed the remote-compile transport
# (HTTP 413) on the 2^20 prove's 4n quotient FFTs.
#
# Caveat carried over from warm_tables: the flatten set is whatever is
# built at call time, so warming must happen BEFORE the first jit call of
# a given variant (a later-built table changes the treedef and forces one
# retrace of that call signature).
# ----------------------------------------------------------------------
_HOST_ATTRS = (
    "size",
    "log2_size",
    "root",
    "root_inverse",
    "domain_inverse",
    "generator",
    "generator_inverse",
)


def _domain_flatten(d: EvaluationDomain):
    dyn = {k: v for k, v in d.__dict__.items() if k not in _HOST_ATTRS}
    leaves, treedef = jax.tree_util.tree_flatten(dyn)
    is_arr = tuple(
        isinstance(leaf, (jax.Array, np.ndarray)) for leaf in leaves
    )
    children = tuple(l for l, a in zip(leaves, is_arr) if a)
    host = tuple(l for l, a in zip(leaves, is_arr) if not a)
    aux = (
        tuple(getattr(d, k) for k in _HOST_ATTRS),
        treedef,
        is_arr,
        host,
    )
    return children, aux


def _domain_unflatten(aux, children) -> EvaluationDomain:
    host_attrs, treedef, is_arr, host = aux
    obj = object.__new__(EvaluationDomain)
    for k, v in zip(_HOST_ATTRS, host_attrs):
        object.__setattr__(obj, k, v)
    it_c, it_h = iter(children), iter(host)
    leaves = [next(it_c) if a else next(it_h) for a in is_arr]
    obj.__dict__.update(jax.tree_util.tree_unflatten(treedef, leaves))
    return obj


jax.tree_util.register_pytree_node(
    EvaluationDomain, _domain_flatten, _domain_unflatten
)


@functools.partial(jax.jit, static_argnames=("n",))
def _power_table_jit(base_arr: jnp.ndarray, n: int) -> jnp.ndarray:
    from ..utils.scans import hillis_scan

    one = fr.full((1,), fr.one)
    xs = jnp.concatenate(
        [one, jnp.broadcast_to(base_arr, (18, n - 1))], axis=1
    )
    return hillis_scan(fr.mont_mul, xs, axis=1)


@functools.lru_cache(maxsize=None)
def get_domain(size: int) -> EvaluationDomain:
    return EvaluationDomain(size)
