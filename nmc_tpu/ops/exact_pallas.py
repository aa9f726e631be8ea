"""Fused meet-in-the-middle energy-table kernel.

The exact solver's hot loop (nmc_tpu/exact.py) is

    T[ia, ib] = EA[ia] + EB[ib] - SA[ia, :] . CBT[:, ib]
    best      = argmin over the 2^(a+b) table

The XLA variant materializes every [blkA, blkB] tile of T in HBM between
the matmul and the reduction — at n = 50 that's ~4.5 PB of round trips.
This kernel computes each tile on the MXU and reduces it to a per-row
running (min, argmin) in VMEM before it ever leaves the chip: HBM sees
only the +-1 tables and two [2^a] result vectors.

Grid: (A tiles, B tiles), B innermost ("arbitrary": the output block for
a fixed A tile is revisited across B steps and accumulated in place —
the standard Pallas accumulator pattern). Matmuls run f32 at
Precision.HIGHEST: energies are integer-valued and must stay exact
(guarded < 2^24 by the caller, see exact.exact_energy_bound).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mitm_min_pallas"]


def _kernel(sa_ref, cbt_ref, ea_ref, eb_ref, oute_ref, outb_ref, *,
            block_b: int):
    j = pl.program_id(1)
    # [blkA, blkB] energy tile, VMEM-resident only
    T = (ea_ref[0, :][:, None] + eb_ref[0, :][None, :]
         - jnp.dot(sa_ref[:], cbt_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST))
    m = jnp.min(T, axis=1)                                   # [blkA]
    # Mosaic-safe argmin: lane iota masked to the per-row minimum
    iota = jax.lax.broadcasted_iota(jnp.int32, T.shape, 1)
    amin = jnp.min(jnp.where(T == m[:, None], iota, jnp.int32(1 << 30)),
                   axis=1) + j * block_b

    @pl.when(j == 0)
    def _init():
        oute_ref[0, :] = m
        outb_ref[0, :] = amin

    @pl.when(j > 0)
    def _acc():
        better = m < oute_ref[0, :]
        oute_ref[0, :] = jnp.where(better, m, oute_ref[0, :])
        outb_ref[0, :] = jnp.where(better, amin, outb_ref[0, :])


def mitm_min_pallas(SA, CBT, EA, EB, *, block_a: int = 1024,
                    block_b: int = 8192, interpret: bool = False):
    """Per-A-row (min_b energy, argmin_b) over the implicit table
    EA[:, None] + EB[None, :] - SA @ CBT.

    SA [TA, a] +-1 f32; CBT [a, TB] f32; EA [TA] f32 (+inf rows are
    padding); EB [TB] f32. TA % block_a == 0 and TB % block_b == 0 is
    required — pad EA/EB with +inf on the host. Returns (min_e [TA] f32,
    arg_b [TA] i32).
    """
    TA, a = SA.shape
    TB = EB.shape[0]
    block_a = min(block_a, TA)
    block_b = min(block_b, TB)
    if TA % block_a or TB % block_b:
        raise ValueError(f"table sizes ({TA}, {TB}) must be multiples of "
                         f"blocks ({block_a}, {block_b})")
    grid = (TA // block_a, TB // block_b)

    kern = functools.partial(_kernel, block_b=block_b)
    oute, outb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_a, a), lambda i, j: (i, 0)),
            pl.BlockSpec((a, block_b), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_a), lambda i, j: (0, i)),
            pl.BlockSpec((1, block_b), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_a), lambda i, j: (0, i)),
            pl.BlockSpec((1, block_a), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, TA), jnp.float32),
            jax.ShapeDtypeStruct((1, TA), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * TA * TB * a,
            bytes_accessed=(SA.size + CBT.size + EA.size + EB.size
                            + 2 * TA) * 4,
            transcendentals=0,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(SA, CBT, EA.reshape(1, TA), EB.reshape(1, TB))
    return oute[0], outb[0]
