"""Spin-axis sharding: J larger than one chip's HBM.

SURVEY.md (aux subsystems / long-context row) calls for the long-dimension
analogue of sequence parallelism: when N spins outgrow a chip, shard the
coupling matrix COLUMN-blocks over a 'spin' mesh axis and keep the cached
local fields phi sharded the same way. States m (R x N, +-1) are small and
stay replicated along 'spin'; an optional leading 'replica' mesh axis
shards the replica rows on top (2-D spin x replica meshes for NPT-scale
runs beyond one chip).

Colored-sweep step per spin block b (exact Gibbs on colored layouts):
  1. the block's owner device reads its local phi columns and draws the
     heat-bath update for the whole block;
  2. dm [R, B] travels along 'spin' with one psum (non-owners contribute
     zeros) — the ONLY communication, nB * R * B = R * N floats per sweep,
     equivalent to a single all-gather of phi;
  3. every device updates its phi column slice: phi_loc += dm @ J[b, loc].

Energies are per-device partial sums + one psum of R scalars. Production
features (vs the round-1 demo): per-sweep beta schedules (anneal), per-
replica beta (tempering ladders), per-spin update masks (NMC freezing),
all as TRACED arguments (no recompiles per beta), plus swap_round() — a
full PT replica-exchange step at spin-sharded scale. The math is mesh-
invariant: the same key gives the same trajectory on 1 device, an n-way
'spin' mesh, or a 2-D (replica, spin) mesh (tested).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import BlockedProblem, IsingProblem, block_problem
from ..ops.coloring import color_groups
from .swaps import metropolis_label_swap


@dataclasses.dataclass
class SpinShardedConfig:
    block_size: int = 128
    precision: str = "highest"
    dtype: str = "float32"


class SpinShardedState(NamedTuple):
    m: jax.Array             # [R, n_pad] replicated along 'spin'
    phi: jax.Array           # [R, n_pad] sharded over columns ('spin')
    key: jax.Array
    step: jax.Array
    beta_to_slot: jax.Array  # [R] PT label permutation (identity w/o swaps)
    slot_to_beta: jax.Array  # [R]


class SpinShardedSweeper:
    """Colored Gibbs sweeps with J column-sharded over a 'spin' mesh axis
    (optionally replica-sharded over a leading 'replica' axis)."""

    def __init__(
        self,
        problem: IsingProblem,
        cfg: SpinShardedConfig = SpinShardedConfig(),
        mesh: Optional[Mesh] = None,
        axis_name: str = "spin",
        replica_axis: Optional[str] = None,   # e.g. "replica" on 2-D meshes
    ):
        self.cfg = cfg
        self.axis = axis_name
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis_name,))
        self.mesh = mesh
        self.n_dev = mesh.shape[axis_name]
        self.replica_axis = replica_axis
        if replica_axis is not None and replica_axis not in mesh.shape:
            raise ValueError(f"mesh has no axis {replica_axis!r}")

        dtype = jnp.dtype(cfg.dtype)
        np_dtype = np.dtype(dtype.name)
        groups = color_groups(problem.J)
        # pad every color class so the total splits evenly across devices
        blocked = block_problem(problem, block_size=cfg.block_size,
                                groups=groups, dtype=np_dtype)
        if not blocked.colored:
            raise ValueError("spin sharding requires a colored layout")
        need = (-blocked.n_pad) % (cfg.block_size * self.n_dev)
        if need:
            # grow padding to a multiple of block_size * n_dev with empty
            # filler blocks so no block straddles a device boundary
            blocked = _pad_blocked(problem, cfg.block_size, groups,
                                   np_dtype, extra_blocks=need // cfg.block_size)
        self.blocked: BlockedProblem = blocked
        self.n_pad = blocked.n_pad
        self.nB = blocked.num_blocks
        self.B = cfg.block_size
        self.cols_per_dev = self.n_pad // self.n_dev

        spin_cols = NamedSharding(mesh, P(None, axis_name))
        # J stored as [nB, B, n_pad], sharded on the COLUMN axis -> each
        # device holds J[:, :, loc] (the only O(N^2) array, split n_dev ways)
        self.J_rows = jax.device_put(
            jnp.asarray(blocked.J_rows),
            NamedSharding(mesh, P(None, None, axis_name)))
        self.h = jax.device_put(jnp.asarray(blocked.h),
                                NamedSharding(mesh, P(axis_name)))
        self.active = jnp.asarray(blocked.active)  # replicated
        self._spin_cols = spin_cols
        self._sweeps_jit = {}
        self._swap_jit = {}

    # ------------------------------------------------------------------
    def _replica_sharding(self, trailing):
        ra = self.replica_axis
        return NamedSharding(self.mesh, P(ra, *trailing))

    def init_state(self, key, num_replicas: int) -> SpinShardedState:
        k_m, key = jax.random.split(key)
        u = jax.random.uniform(k_m, (num_replicas, self.n_pad))
        m = jnp.where(u < 0.5, -1.0, 1.0).astype(self.h.dtype)
        m = jnp.where(self.active, m, 1.0)
        m = jax.device_put(m, self._replica_sharding((None,)))
        ra = self.replica_axis
        phi = jax.jit(
            lambda m: jnp.matmul(
                m, self.J_rows.reshape(self.n_pad, self.n_pad),
                precision=self.cfg.precision) + self.h,
            out_shardings=NamedSharding(self.mesh, P(ra, self.axis)),
        )(m)
        ids = jnp.arange(num_replicas, dtype=jnp.int32)
        return SpinShardedState(m=m, phi=phi, key=key, step=jnp.int32(0),
                                beta_to_slot=ids, slot_to_beta=ids)

    # ------------------------------------------------------------------
    def _build(self, num_sweeps: int, has_mask: bool):
        axis = self.axis
        nB, B, n_pad = self.nB, self.B, self.n_pad
        cols = self.cols_per_dev
        dtype = self.h.dtype
        precision = self.cfg.precision
        active = self.active

        ra = self.replica_axis

        def _sweeps(J_loc, h_loc, m, phi_loc, beta_sweep, beta_rep, mask,
                    key, step):
            # J_loc: [nB, B, cols]; phi_loc: [R_loc, cols];
            # m: [R_loc, n_pad] replicated along 'spin';
            # beta_sweep: [T]; beta_rep: [R_loc, 1]; mask: [R_loc, n_pad]
            dev = lax.axis_index(axis)
            R = m.shape[0]
            upd = mask & active if has_mask else jnp.broadcast_to(
                active, (R, n_pad))
            # distinct PRNG stream per replica shard (all 'spin' devices of
            # one replica shard MUST draw identically — only the owner's dm
            # is used — but replica shards must not share streams)
            rep_ix = lax.axis_index(ra) if ra is not None else jnp.uint32(0)
            key = jax.random.fold_in(key, rep_ix)

            def one_sweep(t, carry):
                m, phi_loc = carry
                k_t = jax.random.fold_in(jax.random.fold_in(key, step + t),
                                         jnp.uint32(0))
                beta_t = beta_sweep[t] * beta_rep        # [R_loc, 1]

                def one_block(b, carry):
                    m, phi_loc = carry
                    b = b.astype(jnp.int32)
                    s = b * jnp.int32(B)
                    owner = s // jnp.int32(cols)
                    local_start = s - owner * jnp.int32(cols)
                    # owner computes the block update from ITS phi columns
                    zero = jnp.int32(0)
                    xb = lax.dynamic_slice(
                        phi_loc,
                        (zero, jnp.where(dev.astype(jnp.int32) == owner,
                                         local_start, zero)),
                        (R, B))
                    mb = lax.dynamic_slice(m, (zero, s), (R, B))
                    updb = lax.dynamic_slice(upd, (zero, s), (R, B))
                    u = jax.random.uniform(jax.random.fold_in(k_t, b), (R, B),
                                           dtype=dtype)
                    p_up = 0.5 * (1.0 + jnp.tanh(beta_t * xb))
                    new = jnp.where(u < p_up, 1.0, -1.0).astype(dtype)
                    new = jnp.where(updb, new, mb)
                    dm_owner = new - mb
                    dm = lax.psum(
                        jnp.where(dev == owner, dm_owner,
                                  jnp.zeros_like(dm_owner)), axis)
                    # everyone updates their phi column slice + replicated m
                    phi_loc = phi_loc + jnp.matmul(dm, J_loc[b],
                                                   precision=precision)
                    m = lax.dynamic_update_slice(m, mb + dm,
                                                 (jnp.int32(0), s))
                    return m, phi_loc

                return lax.fori_loop(0, nB, one_block, (m, phi_loc))

            m, phi_loc = lax.fori_loop(0, num_sweeps, one_sweep, (m, phi_loc))
            # energy: local columns of the replicated m vs local phi slice
            m_loc = lax.dynamic_slice(
                m, (jnp.int32(0), dev.astype(jnp.int32) * jnp.int32(cols)),
                (m.shape[0], cols))
            e_part = -0.5 * jnp.sum(m_loc * (phi_loc + h_loc), axis=1)
            e = lax.psum(e_part, axis)
            return m, phi_loc, e

        ra = self.replica_axis
        smapped = jax.shard_map(
            _sweeps, mesh=self.mesh,
            in_specs=(P(None, None, self.axis), P(self.axis),
                      P(ra, None), P(ra, self.axis),
                      P(), P(ra, None), P(ra, None), P(), P()),
            out_specs=(P(ra, None), P(ra, self.axis), P(ra)),
            check_vma=False,
        )

        def run(state: SpinShardedState, beta_sweep, beta_rep, mask):
            m, phi, e = smapped(self.J_rows, self.h, state.m, state.phi,
                                beta_sweep, beta_rep, mask,
                                state.key, state.step)
            return state._replace(m=m, phi=phi,
                                  step=state.step + num_sweeps), e

        return jax.jit(run)

    def _prep_args(self, num_replicas, num_sweeps, beta, *, anneal=False,
                   initial_beta=0.0, beta_replica=None, update_mask=None):
        dtype = self.h.dtype
        if anneal:
            from ..ops.sweeps import anneal_schedule
            beta_sweep = anneal_schedule(num_sweeps, float(beta),
                                         float(initial_beta), 1, dtype=dtype)
        else:
            beta_sweep = jnp.asarray(beta, dtype)
        beta_sweep = jnp.broadcast_to(beta_sweep, (num_sweeps,))
        beta_rep = (jnp.asarray(beta_replica, dtype).reshape(-1, 1)
                    if beta_replica is not None
                    else jnp.ones((num_replicas, 1), dtype))
        beta_rep = jax.device_put(beta_rep, self._replica_sharding((None,)))
        if update_mask is not None:
            mask = jnp.broadcast_to(
                jnp.asarray(update_mask, bool),
                (num_replicas, self.n_pad))
        else:
            mask = jnp.broadcast_to(self.active, (num_replicas, self.n_pad))
        mask = jax.device_put(mask, self._replica_sharding((None,)))
        return beta_sweep, beta_rep, mask

    def sweeps(self, state: SpinShardedState, num_sweeps: int, beta,
               *, anneal: bool = False, initial_beta: float = 0.0,
               beta_replica=None, update_mask=None):
        """Run `num_sweeps` colored sweeps; returns (state, energies [R]).

        beta: scalar | [T] per-sweep schedule (or anneal=True builds the
        reference's linear ramp); beta_replica: [R] tempering ladder;
        update_mask: [n_pad]/[R, n_pad] bool (False = frozen, blocked
        layout) — the full production parametrization, all traced (one
        compile per (num_sweeps, masked?) signature).
        """
        R = state.m.shape[0]
        has_mask = update_mask is not None
        sig = (num_sweeps, has_mask)
        if sig not in self._sweeps_jit:
            self._sweeps_jit[sig] = self._build(num_sweeps, has_mask)
        beta_sweep, beta_rep, mask = self._prep_args(
            R, num_sweeps, beta, anneal=anneal, initial_beta=initial_beta,
            beta_replica=beta_replica, update_mask=update_mask)
        return self._sweeps_jit[sig](state, beta_sweep, beta_rep, mask)

    # ------------------------------------------------------------------
    def swap_round(self, state: SpinShardedState, num_sweeps: int,
                   beta_list, *, num_swapping_pairs: int = 1):
        """One NPT-style round at spin-sharded scale: sweeps with each
        slot's current tempering beta, then a Metropolis label swap
        (parallel/swaps.py) using the psum'd energies. beta_list: [R]
        sorted inverse temperatures."""
        R = state.m.shape[0]
        beta_list = jnp.asarray(beta_list, self.h.dtype).reshape(R)
        beta_rep = beta_list[state.slot_to_beta]
        state, e = self.sweeps(state, num_sweeps, 1.0,
                               beta_replica=beta_rep)
        key, k_swap = jax.random.split(state.key)
        swap = metropolis_label_swap(
            jax.random.fold_in(k_swap, state.step), state.beta_to_slot,
            beta_list.astype(jnp.float32), e.astype(jnp.float32),
            num_pairs=num_swapping_pairs)
        return state._replace(key=key, beta_to_slot=swap.beta_to_slot,
                              slot_to_beta=swap.slot_to_beta), e

    def states(self, state: SpinShardedState) -> np.ndarray:
        from .distributed import host_gather
        return host_gather(state.m)[:, np.asarray(self.blocked.inv_perm)]


def _pad_blocked(problem, block_size, groups, np_dtype, extra_blocks):
    """block_problem with extra empty padding blocks appended."""
    blocked = block_problem(problem, block_size=block_size, groups=groups,
                            dtype=np_dtype)
    if extra_blocks == 0:
        return blocked
    n_pad = blocked.n_pad + extra_blocks * block_size
    nb = n_pad // block_size

    def pad2(a, shape):
        out = np.zeros(shape, dtype=a.dtype)
        out[tuple(slice(0, s) for s in a.shape)] = a
        return out

    Jp = pad2(blocked.J_rows.reshape(blocked.n_pad, blocked.n_pad),
              (n_pad, n_pad))
    return BlockedProblem(
        J_rows=Jp.reshape(nb, block_size, n_pad),
        J_diag=np.stack([Jp[b * block_size:(b + 1) * block_size,
                            b * block_size:(b + 1) * block_size]
                         for b in range(nb)]),
        h=pad2(blocked.h, (n_pad,)),
        active=pad2(blocked.active, (n_pad,)),
        perm=np.concatenate([blocked.perm,
                             np.full(extra_blocks * block_size, -1,
                                     np.int32)]),
        inv_perm=blocked.inv_perm,
        n=blocked.n,
        block_size=block_size,
        colored=True,
    )
