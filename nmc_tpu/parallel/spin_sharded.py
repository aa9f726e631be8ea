"""Spin-axis sharding: J larger than one chip's HBM.

SURVEY.md (aux subsystems / long-context row) calls for the long-dimension
analogue of sequence parallelism: when N spins outgrow a chip, shard the
coupling matrix COLUMN-blocks over a 'spin' mesh axis and keep the cached
local fields phi sharded the same way. States m (R x N, +-1) are tiny and
stay replicated.

Colored-sweep step per spin block b (exact Gibbs on colored layouts):
  1. the block's owner device reads its local phi columns and draws the
     heat-bath update for the whole block;
  2. dm [R, B] travels to everyone with one psum (non-owners contribute
     zeros) — the ONLY communication, nB * R * B = R * N floats per sweep,
     equivalent to a single all-gather of phi;
  3. every device updates its phi column slice: phi_loc += dm @ J[b, loc].

Energies are per-device partial sums + one psum of R scalars.
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


@dataclasses.dataclass
class SpinShardedConfig:
    block_size: int = 128
    precision: str = "highest"
    dtype: str = "float32"


class SpinShardedState(NamedTuple):
    m: jax.Array      # [R, n_pad] replicated
    phi: jax.Array    # [R, n_pad] sharded over columns ('spin' axis)
    key: jax.Array
    step: jax.Array


class SpinShardedSweeper:
    """Colored Gibbs sweeps with J column-sharded over a 'spin' mesh axis."""

    def __init__(
        self,
        problem: IsingProblem,
        cfg: SpinShardedConfig = SpinShardedConfig(),
        mesh: Optional[Mesh] = None,
        axis_name: str = "spin",
    ):
        self.cfg = cfg
        self.axis = axis_name
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis_name,))
        self.mesh = mesh
        self.n_dev = mesh.shape[axis_name]

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

        Jp = blocked.J_rows.reshape(self.n_pad, self.n_pad)
        spin_cols = NamedSharding(mesh, P(None, axis_name))
        # J stored as [nB, B, n_pad], sharded on the COLUMN axis -> each
        # device holds J[:, :, loc] (the only O(N^2) array, split n_dev ways)
        self.J_rows = jax.device_put(
            jnp.asarray(blocked.J_rows), NamedSharding(mesh, P(None, None, axis_name)))
        self.h = jax.device_put(jnp.asarray(blocked.h),
                                NamedSharding(mesh, P(axis_name)))
        self.active = jnp.asarray(blocked.active)  # replicated
        self._spin_cols = spin_cols
        self._sweeps_jit = {}

    def init_state(self, key, num_replicas: int) -> SpinShardedState:
        k_m, key = jax.random.split(key)
        u = jax.random.uniform(k_m, (num_replicas, self.n_pad))
        m = jnp.where(u < 0.5, -1.0, 1.0).astype(self.h.dtype)
        m = jnp.where(self.active, m, 1.0)
        # phi columns sharded like J columns
        phi = jax.jit(
            lambda m: jnp.matmul(
                m, self.J_rows.reshape(self.n_pad, self.n_pad),
                precision=self.cfg.precision) + self.h,
            out_shardings=self._spin_cols,
        )(m)
        return SpinShardedState(m=m, phi=phi, key=key, step=jnp.int32(0))

    def _build(self, num_sweeps: int, beta: float):
        axis = self.axis
        nB, B, n_pad = self.nB, self.B, self.n_pad
        cols = self.cols_per_dev
        dtype = self.h.dtype
        precision = self.cfg.precision
        active = self.active

        def _sweeps(J_loc, h_loc, m, phi_loc, key, step):
            # J_loc: [nB, B, cols], phi_loc: [R, cols], m: [R, n_pad] repl.
            dev = lax.axis_index(axis)
            R = m.shape[0]

            def one_sweep(t, carry):
                m, phi_loc = carry
                k_t = jax.random.fold_in(jax.random.fold_in(key, step + t),
                                         jnp.uint32(0))

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
                    actb = lax.dynamic_slice(
                        jnp.broadcast_to(active, (R, n_pad)), (zero, s),
                        (R, B))
                    u = jax.random.uniform(jax.random.fold_in(k_t, b), (R, B),
                                           dtype=dtype)
                    p_up = 0.5 * (1.0 + jnp.tanh(jnp.asarray(beta, dtype) * xb))
                    new = jnp.where(u < p_up, 1.0, -1.0).astype(dtype)
                    new = jnp.where(actb, new, mb)
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

        shard_map = jax.shard_map
        smapped = shard_map(
            _sweeps, mesh=self.mesh,
            in_specs=(P(None, None, self.axis), P(self.axis), P(None, None),
                      P(None, self.axis), P(), P()),
            out_specs=(P(None, None), P(None, self.axis), P()),
            check_vma=False,
        )

        def run(state: SpinShardedState):
            m, phi, e = smapped(self.J_rows, self.h, state.m, state.phi,
                                state.key, state.step)
            return SpinShardedState(m=m, phi=phi, key=state.key,
                                    step=state.step + num_sweeps), e

        return jax.jit(run)

    def sweeps(self, state: SpinShardedState, num_sweeps: int,
               beta: float):
        """Run `num_sweeps` colored sweeps; returns (state, energies [R])."""
        sig = (num_sweeps, float(beta))
        if sig not in self._sweeps_jit:
            self._sweeps_jit[sig] = self._build(num_sweeps, float(beta))
        return self._sweeps_jit[sig](state)

    def states(self, state: SpinShardedState) -> np.ndarray:
        return np.asarray(state.m)[:, np.asarray(self.blocked.inv_perm)]


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
