"""Pallas TPU kernel: multi-sweep colored-block Gibbs with resident state.

Kernel scope: the COLORED (block-Jacobi) sweep, which is exact heat-bath
Gibbs when each spin block is an independent set (graph-colored layouts
from ops/coloring.py — Chimera/EA/DCL-style sparse topologies, BASELINE
config 4). Per sweep and color block, every spin in the block updates at
once from the cached local fields, then phi is refreshed with one MXU
matmul — no dynamic lane indexing anywhere, which is what Mosaic requires
(single-lane dynamic slices do not lower: "index in dimension 1 must be a
multiple of 128").

What the kernel buys over the XLA path (ops/sweeps.py):
  * J, m, phi, beta multipliers and the update mask stay in VMEM across
    ALL sweeps — the lax.scan path re-materializes its [R, n] carries per
    sweep;
  * uniforms come from the in-core PRNG (pltpu.prng_random_bits) per
    block — the XLA path writes a fresh [R, n] uniform array per sweep;
  * per-sweep energies and the running argmin-best state are tracked
    in-kernel.

The exact SEQUENTIAL within-block scan (dense SK instances) stays on the
XLA engine, which compiles the delayed-update loop extremely well; use
`ops.sweeps.run_sweeps(within_block='sequential')` there.

Heat-bath rule matches /root/reference/NMC/nmc.py:87; exactness on colored
layouts is tested against enumerated Boltzmann distributions
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PallasSweepResult(NamedTuple):
    m: jax.Array         # [R, n_pad]
    phi: jax.Array       # [R, n_pad]
    m_best: jax.Array    # [R, n_pad]
    e_best: jax.Array    # [R]
    energies: jax.Array  # [T, R]


def _kernel(num_sweeps, num_blocks, block_size, r_tile, n_pad,
            seed_ref, beta_sweep_ref,          # scalar-prefetch (SMEM)
            J_ref, h_ref, bs_ref, mask_ref, m_in_ref, phi_in_ref,   # VMEM in
            m_ref, phi_ref, mbest_ref, ebest_ref, e_ref):            # VMEM out
    g = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + g)

    m_ref[:] = m_in_ref[:]
    phi_ref[:] = phi_in_ref[:]
    mbest_ref[:] = m_in_ref[:]
    ebest_ref[:] = jnp.full((r_tile, 1), jnp.inf, jnp.float32)

    B = block_size

    def one_sweep(t, _):
        beta_t = beta_sweep_ref[t]
        for b in range(num_blocks):   # static unroll over color blocks
            s = b * B
            bits = pltpu.prng_random_bits((r_tile, B))
            # top 24 bits -> uniform [0, 1); uint32->f32 is unsupported in
            # Mosaic, so go through int32 (identical after the shift)
            bits24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8,
                                   jnp.int32)
            u = bits24.astype(jnp.float32) * jnp.float32(2.0 ** -24)

            xb = phi_ref[:, s:s + B]
            mb = m_ref[:, s:s + B]
            betab = beta_t * bs_ref[:, s:s + B]
            kb = mask_ref[:, s:s + B]
            p_up = 0.5 * (1.0 + jnp.tanh(betab * xb))
            new = jnp.where(u < p_up, 1.0, -1.0).astype(jnp.float32)
            new = jnp.where(kb, new, mb)
            dm = new - mb                                     # [R_t, B]
            phi_ref[:] = phi_ref[:] + jnp.dot(
                dm, J_ref[s:s + B, :], preferred_element_type=jnp.float32)
            m_ref[:, s:s + B] = new

        e = -0.5 * jnp.sum(m_ref[:] * (phi_ref[:] + h_ref[:]),
                           axis=1, keepdims=True)             # [R_t, 1]
        e_ref[t, :] = e[:, 0]
        better = e < ebest_ref[:]
        ebest_ref[:] = jnp.where(better, e, ebest_ref[:])
        mbest_ref[:] = jnp.where(better, m_ref[:], mbest_ref[:])
        return 0

    jax.lax.fori_loop(0, num_sweeps, one_sweep, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "block_size", "r_tile", "interpret"),
)
def pallas_colored_sweeps(
    J,            # [n_pad, n_pad] float32 (zero-padded, symmetric,
                  #   zero diagonal blocks — colored layout)
    h,            # [n_pad]
    m0,           # [R, n_pad] in {-1, +1}, float32
    phi0,         # [R, n_pad]
    seed,         # int32 scalar
    beta_sweep,   # [T]
    beta_spin,    # [R, n_pad]
    update_mask,  # [R, n_pad] bool
    *,
    num_sweeps: int,
    block_size: int = 128,
    r_tile: int = 256,
    interpret: bool = False,
) -> PallasSweepResult:
    n_pad = J.shape[0]
    R = m0.shape[0]
    if n_pad % block_size:
        raise ValueError("n_pad must be a multiple of block_size")
    if R % r_tile:
        r_tile = R  # single tile fallback for small batches
    num_blocks = n_pad // block_size
    grid = (R // r_tile,)

    kern = functools.partial(_kernel, num_sweeps, num_blocks, block_size,
                             r_tile, n_pad)

    vm = pltpu.VMEM
    rspec = pl.BlockSpec((r_tile, n_pad), lambda g, *_: (g, 0),
                         memory_space=vm)
    out_shapes = (
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),   # m
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),   # phi
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),   # m_best
        jax.ShapeDtypeStruct((R, 1), jnp.float32),       # e_best
        jax.ShapeDtypeStruct((num_sweeps, R), jnp.float32),  # energies
    )
    out_specs = (
        rspec, rspec, rspec,
        pl.BlockSpec((r_tile, 1), lambda g, *_: (g, 0), memory_space=vm),
        pl.BlockSpec((num_sweeps, r_tile), lambda g, *_: (0, g),
                     memory_space=vm),
    )
    in_specs = [
        pl.BlockSpec((n_pad, n_pad), lambda g, *_: (0, 0),
                     memory_space=vm),                                # J
        pl.BlockSpec((n_pad,), lambda g, *_: (0,), memory_space=vm),  # h
        rspec,                                                        # beta
        rspec,                                                        # mask
        rspec,                                                        # m0
        rspec,                                                        # phi0
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # seed, beta_sweep
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )

    m, phi, m_best, e_best, energies = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # TPU-semantics interpreter (pltpu primitives work on CPU)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.broadcast_to(jnp.asarray(beta_sweep, jnp.float32), (num_sweeps,)),
        jnp.asarray(J, jnp.float32),
        jnp.asarray(h, jnp.float32),
        jnp.broadcast_to(jnp.asarray(beta_spin, jnp.float32), (R, n_pad)),
        jnp.broadcast_to(update_mask, (R, n_pad)),
        jnp.asarray(m0, jnp.float32),
        jnp.asarray(phi0, jnp.float32),
    )
    return PallasSweepResult(m=m, phi=phi, m_best=m_best,
                             e_best=e_best[:, 0], energies=energies)
