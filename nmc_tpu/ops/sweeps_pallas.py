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


def _prec(p):
    """Map a config precision string to a lax.Precision for the kernel
    matmuls. The MXU's single-pass default multiplies f32 operands as
    bf16, perturbing J by up to ~0.4%% — 'highest' keeps the sampled
    Hamiltonian exactly the loaded instance (see ops/round_pallas.py)."""
    import jax.lax as lax
    if isinstance(p, lax.Precision):
        return p
    return {"default": lax.Precision.DEFAULT,
            "high": lax.Precision.HIGH,
            "highest": lax.Precision.HIGHEST}[str(p)]


def _seed2(seed):
    """Normalize a seed (scalar or [2] int32) to TWO int32 words: the
    kernels seed the in-core PRNG with (word0 + grid_index, word1), a
    62-bit space, so long campaigns cannot birthday-collide sweep-batch
    streams the way a single 31-bit draw could (ADVICE round 1 #3)."""
    s = jnp.asarray(seed, jnp.int32).reshape(-1)
    if s.shape[0] < 2:
        s = jnp.concatenate([s, jnp.zeros(2 - s.shape[0], jnp.int32)])
    return s[:2]


class PallasSweepResult(NamedTuple):
    m: jax.Array         # [R, n_pad]
    phi: jax.Array       # [R, n_pad]
    m_best: jax.Array    # [R, n_pad]
    e_best: jax.Array    # [R]
    energies: jax.Array  # [T, R]


def _kernel(num_sweeps, num_blocks, block_size, r_tile, n_pad, precision,
            seed_ref, beta_sweep_ref,          # scalar-prefetch (SMEM)
            J_ref, h_ref, bs_ref, mask_ref, m_in_ref, phi_in_ref,   # VMEM in
            m_ref, phi_ref, mbest_ref, ebest_ref, e_ref):            # VMEM out
    g = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + g, seed_ref[1])

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
                dm, J_ref[s:s + B, :], preferred_element_type=jnp.float32,
                precision=precision)
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
    static_argnames=("num_sweeps", "block_size", "r_tile", "precision",
                     "interpret"),
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
    precision: str = "highest",
    interpret: bool = False,
) -> PallasSweepResult:
    n_pad = J.shape[0]
    R = m0.shape[0]
    if n_pad % block_size:
        raise ValueError("n_pad must be a multiple of block_size")
    if R % r_tile or (r_tile % 128 and r_tile != R):
        r_tile = R  # single tile fallback (lane dim must be 128-divisible
                    # or equal to the full replica count)
    num_blocks = n_pad // block_size
    grid = (R // r_tile,)

    kern = functools.partial(_kernel, num_sweeps, num_blocks, block_size,
                             r_tile, n_pad, _prec(precision))

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
        _seed2(seed),
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


def _streamed_kernel(num_sweeps, num_blocks, block_size, r_tile, n_pad,
                     bs_full, precision,
                     seed_ref, beta_sweep_ref,                  # SMEM
                     J_hbm_ref, h_ref, beta_row_ref, bs_ref, mask_ref,
                     m_in_ref, phi_in_ref,                       # aliased io
                     m_ref, phi_ref, mbest_ref, ebest_ref, e_ref,  # outputs
                     jbuf, sems):                                # scratch
    g = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + g, seed_ref[1])

    # m_in/phi_in are ALIASED to m/phi (input_output_aliases), so on TPU
    # these are no-op self-copies; the interpreter gives outputs fresh
    # NaN buffers, so the explicit copy initializes state there.
    m_ref[:] = m_in_ref[:]
    phi_ref[:] = phi_in_ref[:]
    mbest_ref[:] = m_ref[:]
    ebest_ref[:] = jnp.full((r_tile, 1), jnp.inf, jnp.float32)

    B = block_size
    total = num_sweeps * num_blocks

    def dma(slot, b):
        return pltpu.make_async_copy(J_hbm_ref.at[b], jbuf.at[slot],
                                     sems.at[slot])

    dma(0, 0).start()

    def step(i, _):
        t = i // num_blocks
        b = i % num_blocks
        slot = i % 2
        nslot = (i + 1) % 2

        @pl.when(i + 1 < total)
        def _():
            dma(nslot, (i + 1) % num_blocks).start()

        dma(slot, b).wait()

        s = pl.multiple_of(b * B, B)
        beta_t = beta_sweep_ref[t]
        bits = pltpu.prng_random_bits((r_tile, B))
        bits24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8,
                               jnp.int32)
        u = bits24.astype(jnp.float32) * jnp.float32(2.0 ** -24)

        xb = phi_ref[:, pl.ds(s, B)]
        mb = m_ref[:, pl.ds(s, B)]
        bsb = bs_ref[:, pl.ds(s, B)] if bs_full else bs_ref[:]
        betab = beta_t * beta_row_ref[:] * bsb           # [R_t, B] | [R_t, 1]
        maskb = mask_ref[:, pl.ds(s, B)]                 # [1|R_t, B]
        p_up = 0.5 * (1.0 + jnp.tanh(betab * xb))
        new = jnp.where(u < p_up, 1.0, -1.0).astype(jnp.float32)
        new = jnp.where(maskb > 0, new, mb)
        dm = new - mb
        # dm values are exactly representable in the J buffer dtype
        phi_ref[:] = phi_ref[:] + jnp.dot(
            dm.astype(jbuf.dtype), jbuf[slot],
            preferred_element_type=jnp.float32, precision=precision)
        m_ref[:, pl.ds(s, B)] = new

        @pl.when(b == num_blocks - 1)
        def _():
            e = -0.5 * jnp.sum(m_ref[:] * (phi_ref[:] + h_ref[:]),
                               axis=1, keepdims=True)
            e_ref[pl.ds(t, 1), :] = e.T
            better = e < ebest_ref[:]
            ebest_ref[:] = jnp.where(better, e, ebest_ref[:])
            mbest_ref[:] = jnp.where(better, m_ref[:], mbest_ref[:])

        return 0

    jax.lax.fori_loop(0, total, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "block_size", "r_tile", "precision",
                     "interpret"),
)
def pallas_colored_sweeps_streamed(
    J_blocks,     # [nB, B, n_pad] float32, stays in HBM (streamed per block)
    h,            # [n_pad]
    m0,           # [R, n_pad]
    phi0,         # [R, n_pad]
    seed,
    beta_sweep,   # [T] or scalar
    beta_row,     # [R] per-replica beta multiplier
    mask,         # [1, n_pad] activity, or [R, n_pad] per-chain NMC mask
    beta_spin=None,  # [R, n_pad] per-spin beta multiplier (NMC heating)
    *,
    num_sweeps: int,
    block_size: int = 128,
    r_tile: int = 128,
    precision: str = "highest",
    interpret: bool = False,
) -> PallasSweepResult:
    """Colored multi-sweep kernel for J too large for VMEM: states stay
    VMEM-resident for all sweeps, J row-blocks double-buffer from HBM
    (2 x [B, n_pad] buffers), per-replica beta, per-chain update masks and
    per-spin beta multipliers — the full NMC phase parametrization at
    streaming scale. Pass J_blocks as bfloat16 to halve DMA traffic and
    double MXU throughput (phi accumulates in float32 regardless)."""
    nB, B, n_pad = J_blocks.shape
    j_dtype = J_blocks.dtype
    R = m0.shape[0]
    if R % r_tile or (r_tile % 128 and r_tile != R):
        r_tile = R
    grid = (R // r_tile,)
    vm = pltpu.VMEM
    mask = jnp.asarray(mask, jnp.float32)
    mask_rows = mask.shape[0] if mask.ndim == 2 else 1
    mask = mask.reshape(mask_rows, n_pad)
    bs_full = beta_spin is not None
    if bs_full:
        bs = jnp.asarray(beta_spin, jnp.float32).reshape(R, n_pad)
        bs_spec = pl.BlockSpec((r_tile, n_pad), lambda g, *_: (g, 0),
                               memory_space=vm)
    else:
        bs = jnp.ones((R, 1), jnp.float32)
        bs_spec = pl.BlockSpec((r_tile, 1), lambda g, *_: (g, 0),
                               memory_space=vm)
    mask_spec = (pl.BlockSpec((1, n_pad), lambda g, *_: (0, 0),
                              memory_space=vm) if mask_rows == 1 else
                 pl.BlockSpec((r_tile, n_pad), lambda g, *_: (g, 0),
                              memory_space=vm))

    kern = functools.partial(_streamed_kernel, num_sweeps, nB, B, r_tile,
                             n_pad, bs_full, _prec(precision))
    rspec = pl.BlockSpec((r_tile, n_pad), lambda g, *_: (g, 0),
                         memory_space=vm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                   # J HBM
            pl.BlockSpec((n_pad,), lambda g, *_: (0,),
                         memory_space=vm),                          # h
            pl.BlockSpec((r_tile, 1), lambda g, *_: (g, 0),
                         memory_space=vm),                          # beta_row
            bs_spec,                                                # beta_spin
            mask_spec,                                              # mask
            rspec, rspec,                                           # m0, phi0
        ],
        out_specs=(
            rspec, rspec, rspec,
            pl.BlockSpec((r_tile, 1), lambda g, *_: (g, 0),
                         memory_space=vm),
            pl.BlockSpec((num_sweeps, r_tile), lambda g, *_: (0, g),
                         memory_space=vm),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, n_pad), j_dtype),       # J double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = (
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((num_sweeps, R), jnp.float32),
    )
    m, phi, m_best, e_best, energies = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes,
        # operand indices count the scalar-prefetch args too:
        # 0:seed 1:beta_sweep 2:J 3:h 4:beta_row 5:bs 6:mask 7:m0 8:phi0
        input_output_aliases={7: 0, 8: 1},
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        _seed2(seed),
        jnp.broadcast_to(jnp.asarray(beta_sweep, jnp.float32), (num_sweeps,)),
        jnp.asarray(J_blocks),
        jnp.asarray(h, jnp.float32),
        jnp.asarray(beta_row, jnp.float32).reshape(R, 1),
        bs,
        mask,
        jnp.asarray(m0, jnp.float32),
        jnp.asarray(phi0, jnp.float32),
    )
    return PallasSweepResult(m=m, phi=phi, m_best=m_best,
                             e_best=e_best[:, 0], energies=energies)


def _sparse_streamed_kernel(num_sweeps, num_blocks, block_size, num_tiles,
                            r_tile, n_pad, bs_full, precision,
                            seed_ref, beta_sweep_ref, col_idx_ref,   # SMEM
                            J_tiles_hbm_ref, h_ref, beta_row_ref, bs_ref,
                            mask_ref,
                            m_in_ref, phi_in_ref,                     # aliased
                            m_ref, phi_ref, mbest_ref, ebest_ref, e_ref,
                            tbuf, sems):                              # scratch
    g = pl.program_id(0)
    # 62-bit seed (two int32 words) so long runs cannot birthday-collide
    # sweep-batch streams the way a single 31-bit draw could
    pltpu.prng_seed(seed_ref[0] + g, seed_ref[1])

    # m_in/phi_in are ALIASED to m/phi on TPU, so these are no-op
    # self-copies there; the interpreter gives outputs fresh NaN buffers,
    # so the explicit copy is what initializes state in interpret mode.
    m_ref[:] = m_in_ref[:]
    phi_ref[:] = phi_in_ref[:]
    mbest_ref[:] = m_ref[:]
    ebest_ref[:] = jnp.full((r_tile, 1), jnp.inf, jnp.float32)

    B = block_size
    K = num_tiles
    total = num_sweeps * num_blocks

    def dma(slot, b):
        # one contiguous [B, K*B] slab: row block b's K nonzero column
        # tiles side by side (wrapper pre-concatenates), so the phi
        # update is ONE wide MXU matmul per row block
        return pltpu.make_async_copy(J_tiles_hbm_ref.at[b], tbuf.at[slot],
                                     sems.at[slot])

    dma(0, 0).start()

    def step(i, _):
        t = i // num_blocks
        b = i % num_blocks
        slot = i % 2
        nslot = (i + 1) % 2

        @pl.when(i + 1 < total)
        def _():
            dma(nslot, (i + 1) % num_blocks).start()

        dma(slot, b).wait()

        s = pl.multiple_of(b * B, B)
        beta_t = beta_sweep_ref[t]
        bits = pltpu.prng_random_bits((r_tile, B))
        bits24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8,
                               jnp.int32)
        u = bits24.astype(jnp.float32) * jnp.float32(2.0 ** -24)

        xb = phi_ref[:, pl.ds(s, B)]
        mb = m_ref[:, pl.ds(s, B)]
        # per-spin beta multiplier (NMC heated clusters) when present:
        # bs_ref is [R_t, n_pad]; otherwise a [R_t, 1] broadcast
        bsb = bs_ref[:, pl.ds(s, B)] if bs_full else bs_ref[:]
        betab = beta_t * beta_row_ref[:] * bsb
        # mask combines the padding-activity mask with any NMC update mask
        # ([1, n_pad] when replica-uniform, [R_t, n_pad] when per-chain)
        maskb = mask_ref[:, pl.ds(s, B)]
        p_up = 0.5 * (1.0 + jnp.tanh(betab * xb))
        new = jnp.where(u < p_up, 1.0, -1.0).astype(jnp.float32)
        new = jnp.where(maskb > 0, new, mb)
        dm = new - mb
        m_ref[:, pl.ds(s, B)] = new
        # phi update over the nonzero column tiles only (zero-padded tiles
        # write a harmless zero delta to column block 0); the slice
        # out[:, k*B:(k+1)*B] equals the former per-tile matmul exactly
        out = jnp.dot(dm.astype(tbuf.dtype), tbuf[slot],
                      preferred_element_type=jnp.float32,
                      precision=precision)
        for k in range(K):
            j = col_idx_ref[b * K + k]
            c = pl.multiple_of(j * B, B)
            phi_ref[:, pl.ds(c, B)] = (phi_ref[:, pl.ds(c, B)]
                                       + out[:, k * B:(k + 1) * B])

        @pl.when(b == num_blocks - 1)
        def _():
            e = -0.5 * jnp.sum(m_ref[:] * (phi_ref[:] + h_ref[:]),
                               axis=1, keepdims=True)
            e_ref[pl.ds(t, 1), :] = e.T
            better = e < ebest_ref[:]
            ebest_ref[:] = jnp.where(better, e, ebest_ref[:])
            mbest_ref[:] = jnp.where(better, m_ref[:], mbest_ref[:])

        return 0

    jax.lax.fori_loop(0, total, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "block_size", "r_tile", "precision",
                     "interpret"),
)
def pallas_colored_sweeps_sparse(
    col_idx,      # [nB, K] int32 nonzero column-tile indices per row block
    J_tiles,      # [nB, K, B, B] (f32 or bf16), stays in HBM
    h, m0, phi0, seed, beta_sweep, beta_row, mask,
    beta_spin=None,   # [R, n_pad] per-spin beta multiplier (NMC heating)
    *,
    num_sweeps: int,
    block_size: int = 128,
    r_tile: int = 128,
    precision: str = "highest",
    interpret: bool = False,
) -> PallasSweepResult:
    """Block-SPARSE streaming colored kernel: per spin block only the
    nonzero [B, B] column tiles of J are DMA'd and multiplied — cuts both
    HBM traffic and MACs by ~num_blocks/K on sparse topologies, with the
    tile loop fused in VMEM (the XLA-level tile loop measured slower due
    to dynamic-update-slice copies; see docs/BENCHMARKS.md).

    `mask` is [1, n_pad] (padding/activity only) or [R, n_pad] (per-chain
    NMC frozen-spin masks ANDed with activity); `beta_spin` enables the
    heated-cluster phase — together they run the NMC C/NC phases
    (/root/reference/NMC/nmc.py:377-406) at sparse-streaming speed."""
    nB, K, B, _ = J_tiles.shape
    # Lay each row block's K column tiles side by side ([B, K*B]) so the
    # kernel's phi update is one wide MXU matmul per row block (mirrors
    # pallas_ensemble_round_streamed). Loop-invariant; XLA hoists it out
    # of callers' scan bodies.
    J_cat = jnp.asarray(J_tiles).transpose(0, 2, 1, 3).reshape(nB, B, K * B)
    n_pad = m0.shape[1]
    R = m0.shape[0]
    if R % r_tile or (r_tile % 128 and r_tile != R):
        r_tile = R
    grid = (R // r_tile,)
    mask = jnp.asarray(mask, jnp.float32)
    mask_rows = mask.shape[0] if mask.ndim == 2 else 1
    mask = mask.reshape(mask_rows, n_pad)
    bs_full = beta_spin is not None
    if bs_full:
        bs = jnp.asarray(beta_spin, jnp.float32).reshape(R, n_pad)
        bs_spec = pl.BlockSpec((r_tile, n_pad), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM)
    else:
        bs = jnp.ones((R, 1), jnp.float32)
        bs_spec = pl.BlockSpec((r_tile, 1), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM)
    if mask_rows == 1:
        mask_spec = pl.BlockSpec((1, n_pad), lambda g, *_: (0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((r_tile, n_pad), lambda g, *_: (g, 0),
                                 memory_space=pltpu.VMEM)

    kern = functools.partial(_sparse_streamed_kernel, num_sweeps, nB, B, K,
                             r_tile, n_pad, bs_full, _prec(precision))
    vm = pltpu.VMEM
    rspec = pl.BlockSpec((r_tile, n_pad), lambda g, *_: (g, 0),
                         memory_space=vm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # seed (2 words), beta_sweep, col_idx (flat)
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                    # tiles
            pl.BlockSpec((n_pad,), lambda g, *_: (0,),
                         memory_space=vm),                           # h
            pl.BlockSpec((r_tile, 1), lambda g, *_: (g, 0),
                         memory_space=vm),                           # beta
            bs_spec,                                                 # beta_spin
            mask_spec,                                               # mask
            rspec, rspec,                                            # m, phi
        ],
        out_specs=(
            rspec, rspec, rspec,
            pl.BlockSpec((r_tile, 1), lambda g, *_: (g, 0),
                         memory_space=vm),
            pl.BlockSpec((num_sweeps, r_tile), lambda g, *_: (0, g),
                         memory_space=vm),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, K * B), J_tiles.dtype),  # tile double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = (
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((R, 1), jnp.float32),
        jax.ShapeDtypeStruct((num_sweeps, R), jnp.float32),
    )
    m, phi, m_best, e_best, energies = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes,
        # 0:seed 1:beta_sweep 2:col_idx 3:tiles 4:h 5:beta 6:bs 7:mask
        # 8:m 9:phi
        input_output_aliases={8: 0, 9: 1},
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        _seed2(seed),
        jnp.broadcast_to(jnp.asarray(beta_sweep, jnp.float32), (num_sweeps,)),
        jnp.asarray(col_idx, jnp.int32).reshape(-1),
        J_cat,
        jnp.asarray(h, jnp.float32),
        jnp.asarray(beta_row, jnp.float32).reshape(R, 1),
        bs,
        mask,
        jnp.asarray(m0, jnp.float32),
        jnp.asarray(phi0, jnp.float32),
    )
    return PallasSweepResult(m=m, phi=phi, m_best=m_best,
                             e_best=e_best[:, 0], energies=energies)
