"""Pallas TPU kernels for vectorized field multiplication.

One kernel = one fused Montgomery multiply over a tile of lanes: all 37
product columns stay in vector registers/VMEM instead of round-tripping
through HBM (the XLA path materializes the (18,18,N) outer product, which
profiling showed is HBM-bound ~100x off speed-of-light).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import NUM_LIMBS, FieldParams
from .limb_ops import LimbField

L = NUM_LIMBS
TILE = 2048  # lanes per grid step; measured best of {512,1024,2048,4096}
# on v5e for the fused mont_mul body (458 vs 415 Mops/s at 1024)


def _rows(ref):
    return [ref[i] for i in range(L)]


def _store(ref, rows):
    for i in range(L):
        ref[i] = rows[i]


@functools.cache
def _mul_fn(params: FieldParams, op: str, interpret: bool = False):
    lf = LimbField(params)

    if op == "mul":
        def kernel(a_ref, b_ref, o_ref):
            _store(o_ref, lf.mont_mul(_rows(a_ref), _rows(b_ref)))
        n_in = 2
    elif op == "sqr":
        def kernel(a_ref, o_ref):
            a = _rows(a_ref)
            _store(o_ref, lf.mont_mul(a, a))
        n_in = 1
    elif op == "add":
        def kernel(a_ref, b_ref, o_ref):
            _store(o_ref, lf.add(_rows(a_ref), _rows(b_ref)))
        n_in = 2
    elif op == "sub":
        def kernel(a_ref, b_ref, o_ref):
            _store(o_ref, lf.sub(_rows(a_ref), _rows(b_ref)))
        n_in = 2
    else:
        raise ValueError(op)

    spec = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    @jax.jit
    def call(*args):
        n = args[0].shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
            grid=(pl.cdiv(n, TILE),),
            in_specs=[spec] * n_in,
            out_specs=spec,
            interpret=interpret,
        )(*args)

    return call


def _interp() -> bool:
    from .. import config

    return config.pallas_interpret()


def mont_mul(params: FieldParams, a, b):
    return _mul_fn(params, "mul", _interp())(a, b)


def sqr(params: FieldParams, a):
    return _mul_fn(params, "sqr", _interp())(a)


def add(params: FieldParams, a, b):
    return _mul_fn(params, "add", _interp())(a, b)


def sub(params: FieldParams, a, b):
    return _mul_fn(params, "sub", _interp())(a, b)
