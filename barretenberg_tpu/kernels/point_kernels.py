"""Fused Pallas TPU kernels for the Jacobian group law.

Each kernel computes a complete masked point operation (the same rational
maps as groups/group.py: dbl-2009-l / add-2007-bl / madd-2007-bl with the
reference's branch ladder as lane selects, groups/group.hpp:153-448) with
every intermediate field element in registers. One add = ~20 field muls
that would otherwise each round-trip HBM.

Infinity masks travel as uint32 rows (shape (1, N)) for clean TPU layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.params import FQ_PARAMS, NUM_LIMBS
from ..groups.group import AffinePoints, JacobianPoints
from .limb_ops import LimbField

L = NUM_LIMBS
TILE = 512


def _rows(ref):
    return [ref[i] for i in range(L)]


def _store(ref, rows):
    for i in range(L):
        ref[i] = rows[i]


def _dbl_rows(f: LimbField, x, y, z):
    a = f.sqr(x)
    b = f.sqr(y)
    c = f.sqr(b)
    d = f.sub(f.sqr(f.add(x, b)), f.add(a, c))
    d = f.double(d)
    e = f.add(f.double(a), a)
    ff = f.sqr(e)
    x3 = f.sub(ff, f.double(d))
    y3 = f.sub(f.mont_mul(e, f.sub(d, x3)), f.double(f.double(f.double(c))))
    z3 = f.double(f.mont_mul(y, z))
    return x3, y3, z3


@functools.cache
def _kernel_fn(op: str, interpret: bool = False):
    f = LimbField(FQ_PARAMS)

    if op == "dbl":
        def kernel(x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref):
            x, y, z = _rows(x_ref), _rows(y_ref), _rows(z_ref)
            x3, y3, z3 = _dbl_rows(f, x, y, z)
            _store(ox_ref, x3)
            _store(oy_ref, y3)
            _store(oz_ref, z3)

        n_in, n_out, has_inf = 3, 3, 0

    elif op == "add":
        def kernel(x1_r, y1_r, z1_r, i1_r, x2_r, y2_r, z2_r, i2_r,
                   ox_r, oy_r, oz_r, oi_r):
            x1, y1, z1 = _rows(x1_r), _rows(y1_r), _rows(z1_r)
            x2, y2, z2 = _rows(x2_r), _rows(y2_r), _rows(z2_r)
            i1 = i1_r[0] != 0
            i2 = i2_r[0] != 0
            z1z1 = f.sqr(z1)
            z2z2 = f.sqr(z2)
            u1 = f.mont_mul(x1, z2z2)
            u2 = f.mont_mul(x2, z1z1)
            s1 = f.mont_mul(y1, f.mont_mul(z2, z2z2))
            s2 = f.mont_mul(y2, f.mont_mul(z1, z1z1))
            h = f.sub(u2, u1)
            r = f.double(f.sub(s2, s1))
            h_zero = f.is_zero(h)
            r_zero = f.is_zero(r)
            i = f.sqr(f.double(h))
            j = f.mont_mul(h, i)
            v = f.mont_mul(u1, i)
            x3 = f.sub(f.sqr(r), f.add(j, f.double(v)))
            y3 = f.sub(f.mont_mul(r, f.sub(v, x3)), f.double(f.mont_mul(s1, j)))
            z3 = f.mont_mul(f.sub(f.sqr(f.add(z1, z2)), f.add(z1z1, z2z2)), h)
            dx, dy, dz = _dbl_rows(f, x1, y1, z1)
            both = (~i1) & (~i2)
            use_dbl = both & h_zero & r_zero
            cancel = both & h_zero & (~r_zero)
            x3 = f.select(use_dbl, dx, x3)
            y3 = f.select(use_dbl, dy, y3)
            z3 = f.select(use_dbl, dz, z3)
            x3 = f.select(i2, x1, f.select(i1, x2, x3))
            y3 = f.select(i2, y1, f.select(i1, y2, y3))
            z3 = f.select(i2, z1, f.select(i1, z2, z3))
            # uint32 select chain (Mosaic rejects bool-vector selects)
            i1u, i2u = i1_r[0], i2_r[0]
            cancel_u = jnp.where(cancel, 1, 0).astype(jnp.uint32)
            inf = jnp.where(i2, i1u, jnp.where(i1, i2u, cancel_u))
            _store(ox_r, x3)
            _store(oy_r, y3)
            _store(oz_r, z3)
            oi_r[0] = inf

        n_in, n_out, has_inf = 8, 4, 2

    elif op == "mixed_add":
        def kernel(x1_r, y1_r, z1_r, i1_r, x2_r, y2_r, i2_r,
                   ox_r, oy_r, oz_r, oi_r):
            x1, y1, z1 = _rows(x1_r), _rows(y1_r), _rows(z1_r)
            x2, y2 = _rows(x2_r), _rows(y2_r)
            i1 = i1_r[0] != 0
            i2 = i2_r[0] != 0
            z1z1 = f.sqr(z1)
            u2 = f.mont_mul(x2, z1z1)
            s2 = f.mont_mul(y2, f.mont_mul(z1, z1z1))
            h = f.sub(u2, x1)
            r = f.double(f.sub(s2, y1))
            h_zero = f.is_zero(h)
            r_zero = f.is_zero(r)
            hh = f.sqr(h)
            i = f.double(f.double(hh))
            j = f.mont_mul(h, i)
            v = f.mont_mul(x1, i)
            x3 = f.sub(f.sqr(r), f.add(j, f.double(v)))
            y3 = f.sub(f.mont_mul(r, f.sub(v, x3)), f.double(f.mont_mul(y1, j)))
            z3 = f.sub(f.sqr(f.add(z1, h)), f.add(z1z1, hh))
            dx, dy, dz = _dbl_rows(f, x1, y1, z1)
            both = (~i1) & (~i2)
            use_dbl = both & h_zero & r_zero
            cancel = both & h_zero & (~r_zero)
            one = f.const_rows(1, x1[0])
            x3 = f.select(use_dbl, dx, x3)
            y3 = f.select(use_dbl, dy, y3)
            z3 = f.select(use_dbl, dz, z3)
            x3 = f.select(i2, x1, f.select(i1, x2, x3))
            y3 = f.select(i2, y1, f.select(i1, y2, y3))
            z3 = f.select(i2, z1, f.select(i1, one, z3))
            i1u, i2u = i1_r[0], i2_r[0]
            cancel_u = jnp.where(cancel, 1, 0).astype(jnp.uint32)
            inf = jnp.where(i2, i1u, jnp.where(i1, i2u, cancel_u))
            _store(ox_r, x3)
            _store(oy_r, y3)
            _store(oz_r, z3)
            oi_r[0] = inf

        n_in, n_out, has_inf = 7, 4, 2
    else:
        raise ValueError(op)

    coord = pl.BlockSpec((L, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    if op == "dbl":
        in_specs = [coord] * 3
        out_specs = (coord,) * 3
    elif op == "add":
        in_specs = [coord, coord, coord, mask, coord, coord, coord, mask]
        out_specs = (coord, coord, coord, mask)
    else:
        in_specs = [coord, coord, coord, mask, coord, coord, mask]
        out_specs = (coord, coord, coord, mask)

    @jax.jit
    def call(*args):
        n = args[0].shape[1]
        if op == "dbl":
            shapes = tuple(jax.ShapeDtypeStruct((L, n), jnp.uint32) for _ in range(3))
        else:
            shapes = (
                jax.ShapeDtypeStruct((L, n), jnp.uint32),
                jax.ShapeDtypeStruct((L, n), jnp.uint32),
                jax.ShapeDtypeStruct((L, n), jnp.uint32),
                jax.ShapeDtypeStruct((1, n), jnp.uint32),
            )
        return pl.pallas_call(
            kernel,
            out_shape=shapes,
            grid=(pl.cdiv(n, TILE),),
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*args)

    return call


def _m(inf):
    return inf.astype(jnp.uint32)[None, :]


def _interp() -> bool:
    from .. import config

    return config.pallas_interpret()


def dbl(p: JacobianPoints) -> JacobianPoints:
    x, y, z = _kernel_fn("dbl", _interp())(p.x, p.y, p.z)
    return JacobianPoints(x, y, z, p.inf)


def add(p: JacobianPoints, q: JacobianPoints) -> JacobianPoints:
    x, y, z, i = _kernel_fn("add", _interp())(
        p.x, p.y, p.z, _m(p.inf), q.x, q.y, q.z, _m(q.inf)
    )
    return JacobianPoints(x, y, z, i[0] != 0)


def mixed_add(p: JacobianPoints, q: AffinePoints) -> JacobianPoints:
    x, y, z, i = _kernel_fn("mixed_add", _interp())(
        p.x, p.y, p.z, _m(p.inf), q.x, q.y, _m(q.inf)
    )
    return JacobianPoints(x, y, z, i[0] != 0)
