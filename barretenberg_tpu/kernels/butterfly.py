"""Fused Pallas butterfly-stage kernel for the radix-2 FFT.

One kernel pass per FFT stage: reads the paired lanes, multiplies the odd
half by the stage twiddle, and writes both butterfly outputs interleaved -
mul + add + sub + twiddle broadcast in a single VMEM-resident pass. This
replaces the round-3 stage loop whose gather/roll/select structure cost
three full HBM passes per stage (the analog of the reference's flattened
butterfly loop, polynomial_arithmetic.cpp:180-260, whose working set lives
in L1/L2 on CPU).

Layout contract: the caller views the level array (18, m, nb) as
``x5 = (18, G, 2, h, nb)`` with h = 2^s the butterfly half-width and
G = m / (2h) the block count; element (g, 0, t, lane) is position
j = g*2h + t of the classic in-place schedule and (g, 1, t, lane) is its
partner j + h. Outputs land at the same positions, so the same reshape
serves every stage.
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

# Largest h*TB lane block the mont_mul body compiles comfortably at
# (empirically (64,128)..(128,128) blocks are good on v5e; bigger blocks
# blow up Mosaic compile).
_MAX_BLOCK_LANES = 8192


def _block_dims(h: int, nb: int) -> tuple[int, int]:
    tb = min(nb, 1024)
    hb = max(1, min(h, _MAX_BLOCK_LANES // tb))
    return hb, tb


@functools.cache
def _stage_fn(
    params: FieldParams, g: int, h: int, nb: int, interpret: bool = False
):
    lf = LimbField(params)
    hb, tb = _block_dims(h, nb)

    def kernel(x_ref, tw_ref, o_ref):
        e = [x_ref[i, 0, 0] for i in range(L)]
        o = [x_ref[i, 0, 1] for i in range(L)]
        # tw lives whole in VMEM, pre-reshaped (h/hb, 18, hb) so this
        # block's window is one outer-dim index (lane-dim dynamic slices
        # must be 128-aligned, which hb is not); lane-splat each row
        twb = tw_ref[pl.program_id(1)]  # (18, hb)
        tw = [
            jnp.broadcast_to(twb[i][:, None], (hb, tb)) for i in range(L)
        ]
        t = lf.mont_mul(o, tw)
        lo = lf.add(e, t)
        hi = lf.sub(e, t)
        for i in range(L):
            o_ref[i, 0, 0] = lo[i]
            o_ref[i, 0, 1] = hi[i]

    x_spec = pl.BlockSpec(
        (L, 1, 2, hb, tb),
        lambda gi, hi_, li: (0, gi, 0, hi_, li),
        memory_space=pltpu.VMEM,
    )
    tw_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def call(x5, tw):
        tw_r = jnp.swapaxes(tw.reshape(L, h // hb, hb), 0, 1)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, g, 2, h, nb), jnp.uint32),
            grid=(g, h // hb, nb // tb),
            in_specs=[x_spec, tw_spec],
            out_specs=x_spec,
            interpret=interpret,
        )(x5, tw_r)

    return call


def butterfly_stage(params: FieldParams, x5, tw, interpret: bool = False):
    """x5: (18, G, 2, h, nb) stage view; tw: (18, h) stage twiddles.
    Returns the butterfly outputs in the same view."""
    _, g, _, h, nb = x5.shape
    return _stage_fn(params, g, h, nb, interpret)(x5, tw)
