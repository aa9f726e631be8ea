"""Pallas TPU kernel: one FULL ensemble-NMC round per pallas_call.

The campaign engine (parallel/ensemble_nmc.py) runs, per swap round and
per instance, 3*num_cycles masked/heated Gibbs phases of sweeps_per_phase
sweeps each.  Doing that through the XLA scan path costs a handful of
small kernel launches per sweep, which dominates wall clock at
chimera-512 scale (~2.9e9 attempts/s measured for the 20-instance
ensemble vs ~1e11 for the resident single-problem kernel).

This kernel runs the ENTIRE round in one grid step per instance:

  grid = (num_instances,)
  - J for the instance is DMA'd to VMEM once per round (pipelined with
    the previous instance's compute by the Pallas grid machinery);
  - chain states m / local fields phi stay VMEM-resident across all
    phases of the round;
  - the NMC phase structure of the reference
    (/root/reference/NPT/npt.py:357-477 — heated backbone phase, frozen
    backbone phase, full update every full_update_frequency cycles) is
    statically unrolled: per-slot update masks and per-spin heated betas
    are rebuilt in VMEM from the backbone mask `cl` and the NMC-slot
    flags at each phase boundary;
  - NMC slots jump to their per-phase best state at every phase end
    (reference keeps M_overall_best per phase, npt.py:427-447), plain PT
    slots carry their end state;
  - per-slot best-over-round (energy at sweep ends) and the carried-state
    energies for the replica-exchange Metropolis test are returned.

Exactness: within a phase this is the same colored block-Jacobi heat-bath
as ops/sweeps_pallas.py (exact Gibbs when blocks are independent sets);
semantics vs the XLA round body are covered by tests/test_round_pallas.py
in interpret mode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweeps_pallas import _seed2


class EnsembleRoundResult(NamedTuple):
    m: jax.Array          # [I, R, n_pad] carried states after the round
    m_best: jax.Array     # [I, R, n_pad] best state per slot over the round
    e_best: jax.Array     # [I, R] best sweep-end energy per slot
    e_carried: jax.Array  # [I, R] energy of the carried state (swap test)


def _phase_list(num_cycles: int, full_update_frequency: int):
    phases = []
    for cycle in range(num_cycles):
        phases.append("C")
        phases.append("NC")
        if cycle % full_update_frequency == 0:
            phases.append("ALL")
    return tuple(phases)


def _round_kernel(phases, sweeps_per_phase, num_blocks, block_size,
                  temp_x_inv, R, n_pad,
                  seed_ref,                                     # SMEM [2]
                  J_ref, h_ref, act_ref, cl_ref, dn_ref, beta_ref,
                  m_in_ref,                                     # VMEM in
                  m_ref, mb_ref, eb_ref, ec_ref,                # VMEM out
                  phi, mpb, epb, bsb, mkb):                     # scratch
    g = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + g, seed_ref[1])

    B = block_size
    h = h_ref[0, 0]       # [n_pad]
    act = act_ref[0, 0]   # [n_pad] f32
    dn = dn_ref[0]        # [R, 1] f32 (1 = NMC slot)
    beta = beta_ref[0]    # [R, 1] slot sampling beta

    m_ref[0] = m_in_ref[0]

    def recompute_phi():
        # phi = m @ J + h, row-block by row-block (J symmetric); called at
        # every phase start so f32 drift from the incremental updates is
        # bounded by one phase, exactly like the XLA path (which rebuilds
        # phi per run_sweeps call)
        phi[:] = jnp.broadcast_to(h, (R, n_pad))
        for b in range(num_blocks):
            s = b * B
            phi[:] = phi[:] + jnp.dot(m_ref[0, :, s:s + B],
                                      J_ref[0, s:s + B, :],
                                      preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    eb_ref[0] = jnp.full((R, 1), jnp.inf, jnp.float32)
    mb_ref[0] = m_ref[0]

    for ph in phases:     # static unroll over the reference phase cycle
        cl = cl_ref[0]    # [R, n_pad] f32 backbone mask (re-read per phase)
        if ph == "C":     # heated backbone phase: only cluster spins move
            mkb[:] = dn * (cl * act) + (1.0 - dn) * act
            bsb[:] = 1.0 + dn * cl * jnp.float32(temp_x_inv - 1.0)
        elif ph == "NC":  # frozen backbone phase: only non-cluster spins
            mkb[:] = dn * ((1.0 - cl) * act) + (1.0 - dn) * act
            bsb[:] = jnp.ones((R, n_pad), jnp.float32)
        else:             # ALL
            mkb[:] = jnp.broadcast_to(act, (R, n_pad))
            bsb[:] = jnp.ones((R, n_pad), jnp.float32)

        recompute_phi()
        epb[:] = jnp.full((R, 1), jnp.inf, jnp.float32)
        mpb[:] = m_ref[0]   # never read stale scratch (prev grid instance)
                            # if a sweep's energies are all NaN

        def one_sweep(t, _):
            for b in range(num_blocks):
                s = b * B
                bits = pltpu.prng_random_bits((R, B))
                bits24 = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
                u = bits24.astype(jnp.float32) * jnp.float32(2.0 ** -24)
                xb = phi[:, s:s + B]
                mb = m_ref[0, :, s:s + B]
                betab = beta * bsb[:, s:s + B]
                p_up = 0.5 * (1.0 + jnp.tanh(betab * xb))
                new = jnp.where(u < p_up, 1.0, -1.0).astype(jnp.float32)
                new = jnp.where(mkb[:, s:s + B] > 0, new, mb)
                dm = new - mb
                phi[:] = phi[:] + jnp.dot(
                    dm, J_ref[0, s:s + B, :],
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
                m_ref[0, :, s:s + B] = new
            e = -0.5 * jnp.sum(m_ref[0] * (phi[:] + h),
                               axis=1, keepdims=True)      # [R, 1]
            better = e < epb[:]
            epb[:] = jnp.where(better, e, epb[:])
            mpb[:] = jnp.where(better, m_ref[0], mpb[:])
            return 0

        jax.lax.fori_loop(0, sweeps_per_phase, one_sweep, 0)

        # NMC slots carry their per-phase best (reference npt.py:427-447);
        # phi is rebuilt from m at the next phase start / kernel end
        jump = dn > 0
        m_ref[0] = jnp.where(jump, mpb[:], m_ref[0])
        better = epb[:] < eb_ref[0]
        eb_ref[0] = jnp.where(better, epb[:], eb_ref[0])
        mb_ref[0] = jnp.where(better, mpb[:], mb_ref[0])

    recompute_phi()
    ec_ref[0] = -0.5 * jnp.sum(m_ref[0] * (phi[:] + h),
                               axis=1, keepdims=True)


def round_kernel_vmem_bytes(n_pad: int, R: int) -> int:
    """Rough per-grid-step VMEM footprint (J + 8 [R, n_pad] f32 buffers)."""
    return 4 * n_pad * n_pad + 8 * 4 * R * n_pad + 6 * 4 * n_pad


def streamed_round_vmem_bytes(n_pad: int, R: int, K: int,
                              block_size: int = 128) -> int:
    """VMEM for the streamed variant: tile double-buffer + state buffers."""
    return (2 * K * block_size * block_size * 4
            + 8 * 4 * R * n_pad + 6 * 4 * n_pad)


def resident_sparse_round_vmem_bytes(n_pad: int, R: int, K: int,
                                     block_size: int = 128) -> int:
    """VMEM for the resident-sparse variant: the instance's FULL tile
    stack [nB, B, K*B] lives in VMEM (auto-copied once per grid step)
    instead of double-buffering row slabs — per-sweep J traffic drops to
    zero.  chimera2048 (nB=16, K=5, B=128) is 5.2 MB: far under VMEM
    while the dense [n_pad, n_pad] would be 16.8 MB."""
    nB = n_pad // block_size
    return (nB * K * block_size * block_size * 4
            + 8 * 4 * R * n_pad + 6 * 4 * n_pad)


def _streamed_round_kernel(phases, sweeps_per_phase, num_blocks, block_size,
                           num_tiles, temp_x_inv, R, n_pad, resident,
                           seed_ref, col_idx_ref,                  # SMEM
                           J_tiles_ref, h_ref, act_ref, cl_ref, dn_ref,
                           beta_ref, m_in_ref,                     # ins
                           m_ref, mb_ref, eb_ref, ec_ref,          # outs
                           phi, mpb, epb, bsb, mkb,
                           *dma_scratch):  # (tbuf, sems) unless resident
    g = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + g, seed_ref[1])

    B = block_size
    nB = num_blocks
    K = num_tiles
    h = h_ref[0, 0]
    act = act_ref[0, 0]
    dn = dn_ref[0]
    beta = beta_ref[0]

    if resident:
        # the instance's whole tile stack was auto-copied to VMEM by the
        # BlockSpec — zero per-sweep J traffic, no DMA bookkeeping
        tile_dtype = J_tiles_ref.dtype

        def tile_start(slot, b):
            pass

        def tile_wait_get(slot, b):
            return J_tiles_ref[0, b]
    else:
        tbuf, sems = dma_scratch
        tile_dtype = tbuf.dtype

        def dma(slot, b):
            # one contiguous [B, K*B] slab: row block b's K nonzero
            # column tiles laid side by side (wrapper pre-concatenates),
            # so the phi update is ONE [R, B] x [B, K*B] MXU matmul per
            # row block instead of K narrow [R, B] x [B, B] ones
            return pltpu.make_async_copy(J_tiles_ref.at[g, b],
                                         tbuf.at[slot], sems.at[slot])

        def tile_start(slot, b):
            dma(slot, b).start()

        def tile_wait_get(slot, b):
            dma(slot, b).wait()
            return tbuf[slot]

    def scatter_phi(b, out):
        # out[:, k*B:(k+1)*B] is row block b's contribution to column
        # tile col_idx[b, k]; distinct k hit distinct column tiles, so
        # this is bit-identical to the former per-tile matmuls
        for k in range(K):
            c = col_idx_ref[b * K + k]
            cs = pl.multiple_of(c * B, B)
            phi[:, pl.ds(cs, B)] = (phi[:, pl.ds(cs, B)]
                                    + out[:, k * B:(k + 1) * B])

    m_ref[0] = m_in_ref[0]

    def recompute_phi():
        # phi = m @ J + h via one streamed pass over the row-block tiles
        # (J symmetric; zero-padded tiles write a harmless delta to column
        # 0). Run at every phase start so f32 drift from the incremental
        # updates is bounded by one phase, like the XLA path.
        phi[:] = jnp.broadcast_to(h, (R, n_pad))
        tile_start(0, 0)
        for b in range(nB):      # static pass over row blocks
            slot = b % 2
            if b + 1 < nB:
                tile_start((b + 1) % 2, b + 1)
            tile = tile_wait_get(slot, b)
            s = b * B
            out = jnp.dot(m_ref[0, :, s:s + B].astype(tile_dtype),
                          tile,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            scatter_phi(b, out)

    eb_ref[0] = jnp.full((R, 1), jnp.inf, jnp.float32)
    mb_ref[0] = m_ref[0]

    for ph in phases:            # static unroll over the phase cycle
        cl = cl_ref[0]
        if ph == "C":
            mkb[:] = dn * (cl * act) + (1.0 - dn) * act
            bsb[:] = 1.0 + dn * cl * jnp.float32(temp_x_inv - 1.0)
        elif ph == "NC":
            mkb[:] = dn * ((1.0 - cl) * act) + (1.0 - dn) * act
            bsb[:] = jnp.ones((R, n_pad), jnp.float32)
        else:
            mkb[:] = jnp.broadcast_to(act, (R, n_pad))
            bsb[:] = jnp.ones((R, n_pad), jnp.float32)

        recompute_phi()
        epb[:] = jnp.full((R, 1), jnp.inf, jnp.float32)
        mpb[:] = m_ref[0]   # never read stale scratch (see _round_kernel)
        total = sweeps_per_phase * nB
        tile_start(0, 0)

        def step(i, _):
            b = i % nB
            slot = i % 2
            nslot = (i + 1) % 2

            if not resident:
                @pl.when(i + 1 < total)
                def _():
                    dma(nslot, (i + 1) % nB).start()

            tile = tile_wait_get(slot, b)
            s = pl.multiple_of(b * B, B)
            bits = pltpu.prng_random_bits((R, B))
            bits24 = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
            u = bits24.astype(jnp.float32) * jnp.float32(2.0 ** -24)
            xb = phi[:, pl.ds(s, B)]
            mb = m_ref[0, :, pl.ds(s, B)]
            betab = beta * bsb[:, pl.ds(s, B)]
            p_up = 0.5 * (1.0 + jnp.tanh(betab * xb))
            new = jnp.where(u < p_up, 1.0, -1.0).astype(jnp.float32)
            new = jnp.where(mkb[:, pl.ds(s, B)] > 0, new, mb)
            dm = new - mb
            m_ref[0, :, pl.ds(s, B)] = new
            out = jnp.dot(dm.astype(tile_dtype), tile,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            scatter_phi(b, out)

            @pl.when(b == nB - 1)
            def _():
                e = -0.5 * jnp.sum(m_ref[0] * (phi[:] + h),
                                   axis=1, keepdims=True)
                better = e < epb[:]
                epb[:] = jnp.where(better, e, epb[:])
                mpb[:] = jnp.where(better, m_ref[0], mpb[:])

            return 0

        jax.lax.fori_loop(0, total, step, 0)

        # phi is rebuilt from m at the next phase start / kernel end
        jump = dn > 0
        m_ref[0] = jnp.where(jump, mpb[:], m_ref[0])
        better = epb[:] < eb_ref[0]
        eb_ref[0] = jnp.where(better, epb[:], eb_ref[0])
        mb_ref[0] = jnp.where(better, mpb[:], mb_ref[0])

    recompute_phi()
    ec_ref[0] = -0.5 * jnp.sum(m_ref[0] * (phi[:] + h),
                               axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("num_cycles", "sweeps_per_phase",
                     "full_update_frequency", "temp_x_inv", "block_size",
                     "interpret", "resident"),
)
def pallas_ensemble_round_streamed(
    col_idx,    # [nB, K] int32 union nonzero column-tile indices
    J_tiles,    # [I, nB, K, B, B] per-instance tiles, stays in HBM
    h,          # [I, n_pad]
    act,        # [n_pad]
    m0,         # [I, R, n_pad]
    cl,         # [I, R, n_pad]
    do_nmc,     # [I, R]
    beta_row,   # [I, R]
    seed,
    *,
    num_cycles: int,
    sweeps_per_phase: int,
    full_update_frequency: int = 1,
    temp_x_inv: float = 1.0 / 20.0,
    block_size: int = 128,
    interpret: bool = False,
    resident: bool = False,
) -> EnsembleRoundResult:
    """Streamed variant of pallas_ensemble_round for J too large for VMEM:
    chain states stay VMEM-resident across the whole round, per-instance
    block-SPARSE J column tiles double-buffer from HBM (traffic cut
    n_pad/(K*B) vs dense streaming on chimera/DCL topologies).

    resident=True keeps the instance's WHOLE tile stack in VMEM (one
    BlockSpec copy per grid step, zero per-sweep J traffic) — use when
    `resident_sparse_round_vmem_bytes` fits the cap: the sweep loop at
    chimera2048 is HBM-bound on slab DMA (~330 KB per block step vs
    ~0.2 us of MXU work), so residency removes the dominant traffic
    while the DENSE [n_pad, n_pad] layout would not fit."""
    I, R, n_pad = m0.shape
    _, nB, K, B, _ = J_tiles.shape
    if n_pad != nB * B:
        raise ValueError("tile layout does not match n_pad")
    if sweeps_per_phase < 1:
        raise ValueError(f"sweeps_per_phase must be >= 1, got {sweeps_per_phase}")
    phases = _phase_list(num_cycles, full_update_frequency)
    # Lay each row block's K column tiles side by side ([B, K*B]) so the
    # kernel's phi update is one wide MXU matmul per row block. Loop-
    # invariant inside the callers' scan bodies, so XLA hoists it — one
    # HBM copy, not one per round.
    J_cat = jnp.asarray(J_tiles).transpose(0, 1, 3, 2, 4).reshape(
        I, nB, B, K * B)

    kern = functools.partial(_streamed_round_kernel, phases,
                             sweeps_per_phase, nB, B, K, temp_x_inv,
                             R, n_pad, resident)
    vm = pltpu.VMEM
    hspec = pl.BlockSpec((1, 1, n_pad), lambda g, *_: (g, 0, 0),
                         memory_space=vm)
    aspec = pl.BlockSpec((1, 1, n_pad), lambda g, *_: (0, 0, 0),
                         memory_space=vm)
    rspec = pl.BlockSpec((1, R, n_pad), lambda g, *_: (g, 0, 0),
                         memory_space=vm)
    sspec = pl.BlockSpec((1, R, 1), lambda g, *_: (g, 0, 0), memory_space=vm)

    if resident:
        jspec = pl.BlockSpec((1, nB, B, K * B), lambda g, *_: (g, 0, 0, 0),
                             memory_space=vm)
        dma_scratch = []
    else:
        jspec = pl.BlockSpec(memory_space=pltpu.ANY)      # stays in HBM
        dma_scratch = [
            pltpu.VMEM((2, B, K * B), J_tiles.dtype),  # tile double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # seed, col_idx
        grid=(I,),
        in_specs=[jspec, hspec, aspec, rspec, sspec, sspec, rspec],
        out_specs=(rspec, rspec, sspec, sspec),
        scratch_shapes=[
            pltpu.VMEM((R, n_pad), jnp.float32),   # phi
            pltpu.VMEM((R, n_pad), jnp.float32),   # m phase-best
            pltpu.VMEM((R, 1), jnp.float32),       # e phase-best
            pltpu.VMEM((R, n_pad), jnp.float32),   # per-spin beta mult
            pltpu.VMEM((R, n_pad), jnp.float32),   # update mask
        ] + dma_scratch,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((I, R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((I, R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((I, R, 1), jnp.float32),
        jax.ShapeDtypeStruct((I, R, 1), jnp.float32),
    )
    m, m_best, e_best, e_carried = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes,
        # Mosaic's default scoped-VMEM stack limit (16 MiB) is exceeded
        # by kernel-internal temporaries at DCL-C16 shapes (n_pad=2304:
        # 20.89 MiB measured, r3t_queue/10_lbp_planes_ab.log) — the
        # explicit blocks above are only ~3.4 MiB, the rest is the
        # unrolled phase loop's live ranges. v5e has 128 MiB VMEM/core;
        # raise the per-kernel cap well above the observed need.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        _seed2(seed),
        jnp.asarray(col_idx, jnp.int32).reshape(-1),
        J_cat,
        jnp.asarray(h, jnp.float32).reshape(I, 1, n_pad),
        jnp.asarray(act, jnp.float32).reshape(1, 1, n_pad),
        jnp.asarray(cl, jnp.float32),
        jnp.asarray(do_nmc, jnp.float32).reshape(I, R, 1),
        jnp.asarray(beta_row, jnp.float32).reshape(I, R, 1),
        jnp.asarray(m0, jnp.float32),
    )
    return EnsembleRoundResult(m=m, m_best=m_best,
                               e_best=e_best[..., 0],
                               e_carried=e_carried[..., 0])


@functools.partial(
    jax.jit,
    static_argnames=("num_cycles", "sweeps_per_phase",
                     "full_update_frequency", "temp_x_inv", "block_size",
                     "interpret"),
)
def pallas_ensemble_round(
    J,          # [I, n_pad, n_pad] f32 (blocked colored layout, symmetric)
    h,          # [I, n_pad]
    act,        # [n_pad] activity mask (1 = real spin)
    m0,         # [I, R, n_pad] in {-1, +1}
    cl,         # [I, R, n_pad] backbone masks (bool or 0/1)
    do_nmc,     # [I, R] NMC-slot flags (bool or 0/1)
    beta_row,   # [I, R] slot sampling beta (global_beta already applied
                #        to NMC slots by the caller)
    seed,       # int32 scalar or [2]
    *,
    num_cycles: int,
    sweeps_per_phase: int,
    full_update_frequency: int = 1,
    temp_x_inv: float = 1.0 / 20.0,
    block_size: int = 128,
    interpret: bool = False,
) -> EnsembleRoundResult:
    I, R, n_pad = m0.shape
    if n_pad % block_size:
        raise ValueError("n_pad must be a multiple of block_size")
    if sweeps_per_phase < 1:
        raise ValueError(
            f"sweeps_per_phase must be >= 1, got {sweeps_per_phase}")
    num_blocks = n_pad // block_size
    phases = _phase_list(num_cycles, full_update_frequency)

    kern = functools.partial(_round_kernel, phases, sweeps_per_phase,
                             num_blocks, block_size, temp_x_inv, R, n_pad)
    vm = pltpu.VMEM
    jspec = pl.BlockSpec((1, n_pad, n_pad), lambda g, *_: (g, 0, 0),
                         memory_space=vm)
    # h/act as [*, 1, n_pad]: a (1, n_pad) trailing block satisfies the
    # Mosaic (8, 128)-or-full-dim tiling rule where (1, n_pad) 2-D can't
    hspec = pl.BlockSpec((1, 1, n_pad), lambda g, *_: (g, 0, 0),
                         memory_space=vm)
    aspec = pl.BlockSpec((1, 1, n_pad), lambda g, *_: (0, 0, 0),
                         memory_space=vm)
    rspec = pl.BlockSpec((1, R, n_pad), lambda g, *_: (g, 0, 0),
                         memory_space=vm)
    sspec = pl.BlockSpec((1, R, 1), lambda g, *_: (g, 0, 0), memory_space=vm)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # seed
        grid=(I,),
        in_specs=[jspec, hspec, aspec, rspec, sspec, sspec, rspec],
        out_specs=(rspec, rspec, sspec, sspec),
        scratch_shapes=[
            pltpu.VMEM((R, n_pad), jnp.float32),   # phi
            pltpu.VMEM((R, n_pad), jnp.float32),   # m phase-best
            pltpu.VMEM((R, 1), jnp.float32),       # e phase-best
            pltpu.VMEM((R, n_pad), jnp.float32),   # per-spin beta mult
            pltpu.VMEM((R, n_pad), jnp.float32),   # update mask
        ],
    )
    out_shapes = (
        jax.ShapeDtypeStruct((I, R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((I, R, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((I, R, 1), jnp.float32),
        jax.ShapeDtypeStruct((I, R, 1), jnp.float32),
    )
    m, m_best, e_best, e_carried = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shapes,
        # same scoped-VMEM headroom as the streamed variant (see above)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        _seed2(seed),
        jnp.asarray(J, jnp.float32),
        jnp.asarray(h, jnp.float32).reshape(I, 1, n_pad),
        jnp.asarray(act, jnp.float32).reshape(1, 1, n_pad),
        jnp.asarray(cl, jnp.float32),
        jnp.asarray(do_nmc, jnp.float32).reshape(I, R, 1),
        jnp.asarray(beta_row, jnp.float32).reshape(I, R, 1),
        jnp.asarray(m0, jnp.float32),
    )
    return EnsembleRoundResult(m=m, m_best=m_best,
                               e_best=e_best[..., 0],
                               e_carried=e_carried[..., 0])
