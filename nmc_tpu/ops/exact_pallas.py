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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mitm_min_pallas", "mitm_min_pallas_i8", "int8_planes",
           "I32_PAD"]

# Padding sentinel for invalid A rows on the int32 path. Any true table
# entry is bounded by the caller's < 2^29 guard, so padded rows satisfy
# T_pad >= 2^30 - 2^29 > T_true and T_pad <= 2^30 + 2^29 < 2^31 (no
# wraparound).
I32_PAD = np.int32(1 << 30)


def int8_planes(C) -> np.ndarray:
    """Signed base-256 digit split: C == sum_k 256^k * planes[k], each
    plane int8 in [-128, 127]. C must be integer-valued (any float or int
    dtype); |C| < 2^29 needs at most 4 planes. Host-side prep for the
    int8 meet-in-the-middle kernel."""
    c = np.asarray(C)
    if not np.all(c == np.round(c)):
        raise ValueError("int8_planes requires integer-valued input")
    c = c.astype(np.int64)
    planes = []
    while True:
        d = ((c + 128) % 256) - 128
        planes.append(d.astype(np.int8))
        c = (c - d) >> 8
        if not np.any(c):
            break
    return np.stack(planes)


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


def mitm_min_pallas(SA, CBT, EA, EB, *, block_a: int = 512,
                    block_b: int = 4096, interpret: bool = False):
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


def _kernel_i8(sa_ref, p_ref, ea_ref, eb_ref, oute_ref, outb_ref, *,
               block_b: int, n_planes: int):
    j = pl.program_id(1)
    # cross = SA . CBT reassembled from signed base-256 int8 digit planes:
    # one int8 x int8 -> int32 MXU pass per plane (vs 6 f32-HIGHEST
    # passes), every partial exact in int32 (|dot| <= a * 127 < 2^13,
    # recombined value == true CBT cross term < 2^29).
    cross = jnp.dot(sa_ref[:], p_ref[0],
                    preferred_element_type=jnp.int32)
    for k in range(1, n_planes):
        cross += jnp.int32(1 << (8 * k)) * jnp.dot(
            sa_ref[:], p_ref[k], preferred_element_type=jnp.int32)
    T = ea_ref[0, :][:, None] + eb_ref[0, :][None, :] - cross
    m = jnp.min(T, axis=1)                                   # [blkA] i32
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


def mitm_min_pallas_i8(SA, planes, EA, EB, *, block_a: int = 512,
                       block_b: int = 4096, interpret: bool = False):
    """Integer-exact variant of `mitm_min_pallas` for integer-coupled
    instances (every shipped wishart truth): the cross-term matrix
    arrives as signed base-256 int8 digit planes (see `int8_planes`) and
    the table is reduced entirely in int32.

    SA [TA, a] +-1 int8; planes [K, a, TB] int8; EA [TA] int32 (pad rows
    = I32_PAD); EB [TB] int32. Returns (min_e [TA] i32, arg_b [TA] i32).

    Two wins over the f32 kernel: K one-pass int8 MXU matmuls replace 6
    Precision.HIGHEST f32 passes (K is 2-3 for the shipped instances),
    and exactness holds to |energy| < 2^29 instead of 2^24.
    """
    TA, a = SA.shape
    K, a2, TB = planes.shape
    if a2 != a:
        raise ValueError(f"planes contraction dim {a2} != SA cols {a}")
    block_a = min(block_a, TA)
    block_b = min(block_b, TB)
    if TA % block_a or TB % block_b:
        raise ValueError(f"table sizes ({TA}, {TB}) must be multiples of "
                         f"blocks ({block_a}, {block_b})")
    grid = (TA // block_a, TB // block_b)

    kern = functools.partial(_kernel_i8, block_b=block_b, n_planes=K)
    oute, outb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_a, a), lambda i, j: (i, 0)),
            pl.BlockSpec((K, a, block_b), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, block_a), lambda i, j: (0, i)),
            pl.BlockSpec((1, block_b), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_a), lambda i, j: (0, i)),
            pl.BlockSpec((1, block_a), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, TA), jnp.int32),
            jax.ShapeDtypeStruct((1, TA), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * TA * TB * a * K,
            bytes_accessed=(SA.size + planes.size
                            + 4 * (EA.size + EB.size + 2 * TA)),
            transcendentals=0,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(SA, planes, EA.reshape(1, TA), EB.reshape(1, TB))
    return oute[0], outb[0]
