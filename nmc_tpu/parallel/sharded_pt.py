"""Mesh-sharded NPT: replica-parallel tempering across TPU chips.

The reference scales replicas with one OS process per replica per round
(/root/reference/NPT/npt.py:616-640), shipping the full sweep history
through pickle each round. Here the replica axis is sharded over a
jax.sharding.Mesh: each chip owns R/n_devices chains (states AND cached
local fields stay resident in its HBM forever), the whole swap round —
sweeps, LBP backbone extraction, NMC phases, replica exchange — is ONE
jitted shard_map program, and the only cross-chip traffic is an all_gather
of R scalar energies plus the replicated O(R) label permutation from
parallel/swaps.py. States never cross the ICI.

Faithfulness notes (vs models/npt.py, the exact single-host path):
  * NMC replicas run at global_beta (quirk preserved, npt.py:126).
  * Backbone masks come from thresholding LBP marginals at
    threshold_initial followed by the reference's threshold-decay growth
    (ops/clusters.backbone_mask_device: one masked adjacency propagation
    per static threshold rung). With the shipped defaults the rung ladder
    is empty and the mask reduces to pure thresholding, exactly like the
    host path (SURVEY.md quirk 2); non-default cutoffs now grow clusters
    with flat-mask parity to find_clusters.
  * The lambda ladder runs fully inside jit; the reference's
    divergence-fallback (reuse previous marginal) is applied per rung with
    a where() instead of early exit.
  * An 'instance' mesh axis can be composed on top via vmap/shard_map for
    ensemble runs (parallel/ensemble.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.problem import IsingProblem, block_problem
from ..ops.lbp import lambda_ladder
from ..ops.lbp_jit import (convexified_marginal_dense,
                           convexified_marginal_sparse)
from ..ops.sweeps import run_sweeps
from .swaps import metropolis_label_swap


@dataclasses.dataclass
class ShardedNPTConfig:
    sweeps_per_phase: int = 32
    num_cycles: int = 2
    full_update_frequency: int = 1
    num_swapping_pairs: int = 1
    global_beta: float = 2.5
    temp_x: float = 20.0
    threshold_initial: float = 0.999999
    threshold_cutoff: float = 0.99999
    threshold_step: float = 0.01
    lambda_start: float = 3.0
    lambda_end: float = 0.01
    lambda_reduction_factor: float = 0.5   # short ladder: jit-friendly default
    lbp_max_iterations: int = 30
    lbp_tolerance: float = 1e-7
    lbp_every: int = 1       # recompute backbone clusters every K rounds
                             # (EnsembleNMC; the reference's cadence is one
                             # LBP per swap round, npt.py:397-414 — short
                             # TTS-granularity rounds can refresh less often)
    lbp_mode: str = "auto"   # 'dense' | 'sparse' | 'planes' (scatter-free
                             # slotted-edge LBP via one-hot matmuls,
                             # ops/lbp_planes; raises past the degree cap)
                             # | 'auto': planes when the degree cap holds
                             # (r4 hardware A/B: 5.3x the full NMC round,
                             # results/nmc_phase_breakdown_planes.json),
                             # else sparse above 1024 spins (dense [N,N]
                             # messages blow memory), else dense
    block_size: int = 128
    within_block: str = "sequential"
    use_coloring: bool = False   # graph-colored blocks -> exact Jacobi updates
    precision: str = "highest"
    dtype: str = "float32"
    round_kernel: str = "auto"   # EnsembleNMC whole-round Pallas kernel:
                                 # 'auto' (on accelerators when the layout
                                 # fits VMEM), 'on' (interpret mode on CPU),
                                 # 'off' (XLA scan path)


class ShardedPTState(NamedTuple):
    m: jax.Array             # [R, n_pad] chain states, sharded over 'replica'
    beta_to_slot: jax.Array  # [R] replicated
    slot_to_beta: jax.Array  # [R] replicated
    key: jax.Array           # replicated
    round_index: jax.Array   # scalar
    m_best: jax.Array        # [R, n_pad] best-ever state per slot (sharded)
    e_best: jax.Array        # [R] best-ever energy per slot (sharded)
    cl: jax.Array            # [R, n_pad] carried backbone masks (sharded)
    do_nmc_slot: jax.Array   # [R] slots running NMC phases, frozen between
                             # cluster refreshes (sharded)


class RoundMetrics(NamedTuple):
    slot_energies: jax.Array  # [R] energy of each slot after the round
    accepted: jax.Array       # [num_swapping_pairs] bool
    pairs: jax.Array          # [num_swapping_pairs]


class ShardedNPT:
    """Replica-sharded parallel tempering with optional NMC phases."""

    def __init__(
        self,
        problem: IsingProblem,
        beta_list: Sequence[float],
        doNMC: Sequence[bool],
        cfg: ShardedNPTConfig = ShardedNPTConfig(),
        mesh: Optional[Mesh] = None,
        axis_name: str = "replica",
    ):
        self.cfg = cfg
        self.axis = axis_name
        beta_list = np.asarray(beta_list, dtype=np.float64)
        self.R = beta_list.shape[0]
        self.doNMC = np.asarray(doNMC, dtype=bool)
        if self.doNMC.shape[0] != self.R:
            raise ValueError("doNMC length must match beta_list")
        self.any_nmc = bool(self.doNMC.any())

        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis_name,))
        self.mesh = mesh
        self.n_dev = mesh.shape[axis_name]
        if self.R % self.n_dev != 0:
            raise ValueError(
                f"num replicas {self.R} must divide over {self.n_dev} devices")
        self.R_local = self.R // self.n_dev

        dtype = jnp.dtype(cfg.dtype)
        np_dtype = np.dtype(dtype.name)
        groups = None
        if cfg.use_coloring:
            from ..ops.coloring import color_groups
            groups = color_groups(problem.J)
        self.blocked = block_problem(problem, block_size=cfg.block_size,
                                     groups=groups, dtype=np_dtype)
        if self.blocked.colored:
            # colored layout makes the all-at-once block update exact Gibbs
            cfg = dataclasses.replace(cfg, within_block="jacobi")
            self.cfg = cfg
        b = self.blocked
        self.n_pad = b.n_pad
        # replicated problem data
        self.J_rows = jnp.asarray(b.J_rows)
        self.J_diag = jnp.asarray(b.J_diag)
        self.J_full = self.J_rows.reshape(b.n_pad, b.n_pad)
        self.h = jnp.asarray(b.h)
        self.active = jnp.asarray(b.active)
        self.beta_list = jnp.asarray(beta_list, dtype)
        self.do_nmc_by_beta = jnp.asarray(self.doNMC)
        # epsilon for convexified clamping, blocked layout
        eps = np.abs(b.h) + np.abs(self._dense_J_np()).sum(axis=1)
        self.epsilon = jnp.asarray(eps, dtype)
        self.ladder = tuple(lambda_ladder(cfg.lambda_start, cfg.lambda_end,
                                          cfg.lambda_reduction_factor))
        self.lbp_sparse = (cfg.lbp_mode == "sparse"
                           or (cfg.lbp_mode == "auto" and self.n_pad > 1024))
        self.edge_graph = None
        self.edge_slots = None
        self._w_slot = None
        if self.any_nmc and cfg.lbp_mode in ("planes", "auto"):
            # scatter-free slotted-edge LBP (ops/lbp_planes; see
            # EnsembleNMC for the rationale). DEFAULT under 'auto' since
            # the round-4 hardware A/B (5.3x full round / 37x LBP stage,
            # results/nmc_phase_breakdown_planes.json); explicit 'planes'
            # raises past the degree cap, 'auto' falls back to the
            # edge-list path.
            from ..core.problem import block_sparse_tiles
            from ..ops.lbp_planes import (build_edge_slot_planes,
                                          w_slot_from_tiles)
            col_idx_s, J_tiles_s = block_sparse_tiles(b)
            try:
                esp = build_edge_slot_planes(col_idx_s, J_tiles_s != 0)
            except ValueError:
                if cfg.lbp_mode == "planes":
                    raise
                esp = None
            if esp is not None:
                self.edge_slots = esp
                self._w_slot = jnp.asarray(
                    w_slot_from_tiles(esp, J_tiles_s), dtype)
        if self.any_nmc and self.edge_slots is None and self.lbp_sparse:
            from ..ops.lbp_sparse import EdgeGraph
            g = EdgeGraph.from_dense(self._dense_J_np())
            self.edge_graph = g

        # whole-round Pallas kernel per replica shard (same kernel as
        # EnsembleNMC, instance grid of 1): all NMC phases of a round in
        # one pallas_call instead of the per-phase XLA op stream. Needs
        # the colored (Jacobi-exact) layout, f32, sublane-aligned local
        # replica count, and a VMEM-resident J.
        import os as _os
        _cap = int(_os.environ.get("NMC_TPU_ROUND_VMEM_CAP", 12 * 2 ** 20))
        from ..ops.round_pallas import round_kernel_vmem_bytes
        _backend = jax.default_backend()
        self._round_interpret = _backend == "cpu"
        if cfg.round_kernel not in ("auto", "on", "off"):
            raise ValueError(f"round_kernel must be auto|on|off, "
                             f"got {cfg.round_kernel!r}")
        _gate_fails = []
        if not self.blocked.colored:
            _gate_fails.append("use_coloring=True (colored Jacobi layout)")
        if self.R_local % 8 != 0:
            _gate_fails.append(
                f"R_local={self.R_local} must be a multiple of 8")
        if dtype != jnp.float32:
            _gate_fails.append(f"dtype must be float32, got {dtype}")
        if (round_kernel_vmem_bytes(self.n_pad, self.R_local) > _cap):
            _gate_fails.append(
                f"VMEM estimate "
                f"{round_kernel_vmem_bytes(self.n_pad, self.R_local)} "
                f"exceeds cap {_cap} (NMC_TPU_ROUND_VMEM_CAP)")
        if cfg.round_kernel == "on" and _gate_fails:
            # an explicit kernel request must not silently fall back
            # (mirrors ops/engine.py SweepEngine backend='pallas')
            raise ValueError(
                "round_kernel='on' requested but kernel gates failed: "
                + "; ".join(_gate_fails))
        # TPU-validated (scripts/validate_sharded_round_tpu.py: contract +
        # statistical parity vs the XLA round + 1.4x throughput), so
        # 'auto' engages it on accelerator backends like EnsembleNMC
        self._use_round_kernel = (
            not _gate_fails
            and (cfg.round_kernel == "on"
                 or (cfg.round_kernel == "auto" and _backend != "cpu")))

        self._round_jit = jax.jit(self._build_round())
        self._scan_jit = {}

    def _dense_J_np(self):
        b = self.blocked
        return b.J_rows.reshape(b.n_pad, b.n_pad)

    # ------------------------------------------------------------------
    def init_state(self, key) -> ShardedPTState:
        k_m, key = jax.random.split(key)
        u = jax.random.uniform(k_m, (self.R, self.n_pad),
                               dtype=self.h.dtype)
        m = jnp.where(u < 0.5, -1.0, 1.0).astype(self.h.dtype)
        m = jnp.where(self.active, m, 1.0)
        m = jax.device_put(m, NamedSharding(self.mesh, P(self.axis, None)))
        ids = jnp.arange(self.R, dtype=jnp.int32)
        e_best = jax.device_put(
            jnp.full((self.R,), jnp.inf, self.h.dtype),
            NamedSharding(self.mesh, P(self.axis)))
        # carried backbone masks / NMC-slot set (refreshed on rounds where
        # round_index % lbp_every == 0; round 0 always refreshes)
        cl = jax.device_put(jnp.zeros((self.R, self.n_pad), bool),
                            NamedSharding(self.mesh, P(self.axis, None)))
        do_nmc_slot = jax.device_put(jnp.asarray(self.doNMC),
                                     NamedSharding(self.mesh, P(self.axis)))
        return ShardedPTState(
            m=m, beta_to_slot=ids, slot_to_beta=ids, key=key,
            round_index=jnp.int32(0), m_best=m, e_best=e_best,
            cl=cl, do_nmc_slot=do_nmc_slot,
        )

    # ------------------------------------------------------------------
    def _lbp_marginal(self, m_star):
        """Convexified LBP belief logits for ONE slot (blocked layout),
        fully jitted; vmapped over local slots by the caller. Shared body:
        ops/lbp_jit.convexified_marginal_dense."""
        cfg = self.cfg
        return convexified_marginal_dense(
            self.J_full, self.h, self.epsilon, m_star,
            beta=cfg.global_beta, ladder=self.ladder,
            max_iterations=cfg.lbp_max_iterations,
            tolerance=cfg.lbp_tolerance)

    def _lbp_marginal_sparse(self, m_star):
        """Edge-message convexified LBP for ONE slot (O(nnz) per iter,
        in-jit): the large-N path — dense [N, N] messages per slot would
        blow memory under vmap over R_local. Shared body:
        ops/lbp_jit.convexified_marginal_sparse."""
        cfg = self.cfg
        g = self.edge_graph
        return convexified_marginal_sparse(
            g, g.weight, self.h, self.epsilon, m_star,
            beta=cfg.global_beta, ladder=self.ladder,
            max_iterations=cfg.lbp_max_iterations,
            tolerance=cfg.lbp_tolerance)

    def _lbp_marginal_planes(self, m_star):
        """Slotted-edge convexified LBP for ONE slot — scatter-free
        (ops/lbp_planes.convexified_marginal_planes), opt-in via
        lbp_mode='planes'."""
        from ..ops.lbp_planes import convexified_marginal_planes
        cfg = self.cfg
        return convexified_marginal_planes(
            self.edge_slots, self._w_slot, self.h, self.epsilon, m_star,
            beta=cfg.global_beta, ladder=self.ladder,
            max_iterations=cfg.lbp_max_iterations,
            tolerance=cfg.lbp_tolerance)

    # ------------------------------------------------------------------
    def _build_round(self):
        cfg = self.cfg
        axis = self.axis
        R_local = self.R_local
        n_pad = self.n_pad
        dtype = self.h.dtype

        def phase(m, key, beta_spin, mask):
            phi = jnp.matmul(m, self.J_full, precision=cfg.precision) + self.h
            return run_sweeps(
                self.J_rows, self.J_diag, self.h, m, phi, key,
                jnp.ones((cfg.sweeps_per_phase,), dtype), beta_spin, mask,
                num_sweeps=cfg.sweeps_per_phase,
                within_block=cfg.within_block, block_order="fixed",
                record_m=False, precision=cfg.precision,
            )

        def _round(m_local, beta_to_slot, slot_to_beta, key, round_index,
                   mb_local, eb_local, cl_local, do_nmc_local):
            dev = lax.axis_index(axis)
            k_dev = jax.random.fold_in(jax.random.fold_in(key, round_index), dev)
            k_swap = jax.random.fold_in(jax.random.fold_in(key, round_index),
                                        jnp.uint32(0xD00D))

            beta_idx_local = lax.dynamic_slice(
                slot_to_beta, (dev * R_local,), (R_local,))
            beta_local = self.beta_list[beta_idx_local]          # [R_local]
            act = jnp.broadcast_to(self.active, (R_local, n_pad))

            if self.any_nmc:
                from ..ops.clusters import backbone_mask_device
                lbp_fn = (self._lbp_marginal_planes
                          if self.edge_slots is not None
                          else self._lbp_marginal_sparse if self.lbp_sparse
                          else self._lbp_marginal)

                def compute_cl():
                    marg = jax.vmap(lbp_fn)(m_local)
                    # threshold seeds + the reference's threshold-decay
                    # growth (one masked adjacency propagation per rung; a
                    # no-op with the shipped defaults, exactly like the
                    # host path); marg carries belief logits -> thresholds
                    # map via atanh
                    cl_new = backbone_mask_device(
                        marg, jnp.abs(self.J_full), cfg.threshold_initial,
                        cfg.threshold_cutoff, cfg.threshold_step,
                        active=act, logits=True)
                    return cl_new, self.do_nmc_by_beta[beta_idx_local]

                if cfg.lbp_every == 1:
                    cl, do_nmc = compute_cl()
                else:
                    # refresh backbone masks every lbp_every rounds; the
                    # NMC-slot set freezes with them (the backbone belongs
                    # to the chain's state, not its label — see
                    # ensemble_nmc.py)
                    refresh = (round_index % cfg.lbp_every) == 0
                    cl, do_nmc = lax.cond(
                        refresh, compute_cl,
                        lambda: (cl_local, do_nmc_local))
            else:
                cl = act
                do_nmc = do_nmc_local    # all-False by construction

            base_row = jnp.where(do_nmc, jnp.asarray(cfg.global_beta, dtype),
                                 beta_local.astype(dtype))[:, None]

            if self._use_round_kernel:
                from ..ops.round_pallas import pallas_ensemble_round
                kd = (jax.random.key_data(k_dev)
                      if jnp.issubdtype(k_dev.dtype, jax.dtypes.prng_key)
                      else k_dev)
                seed = lax.bitcast_convert_type(
                    kd.reshape(-1)[:2].astype(jnp.uint32), jnp.int32)
                res = pallas_ensemble_round(
                    self.J_full[None], self.h[None], self.active,
                    m_local[None], cl[None], do_nmc[None],
                    base_row[:, 0][None], seed,
                    num_cycles=cfg.num_cycles,
                    sweeps_per_phase=cfg.sweeps_per_phase,
                    full_update_frequency=cfg.full_update_frequency,
                    temp_x_inv=1.0 / cfg.temp_x,
                    block_size=self.blocked.block_size,
                    interpret=self._round_interpret)
                m_local = res.m[0]
                improved = res.e_best[0] < eb_local
                eb_local = jnp.where(improved, res.e_best[0], eb_local)
                mb_local = jnp.where(improved[:, None], res.m_best[0],
                                     mb_local)
                e_carried = res.e_carried[0]
                e_all = lax.all_gather(e_carried, axis, tiled=True)  # [R]
                swap = metropolis_label_swap(
                    k_swap, beta_to_slot,
                    self.beta_list.astype(jnp.float32),
                    e_all.astype(jnp.float32),
                    num_pairs=cfg.num_swapping_pairs)
                metrics = RoundMetrics(slot_energies=e_all,
                                       accepted=swap.accepted,
                                       pairs=swap.pairs)
                return (m_local, swap.beta_to_slot, swap.slot_to_beta,
                        metrics, mb_local, eb_local, cl, do_nmc)

            def track_best(res):
                nonlocal mb_local, eb_local
                improved = res.e_best < eb_local
                eb_local = jnp.where(improved, res.e_best, eb_local)
                mb_local = jnp.where(improved[:, None], res.m_best, mb_local)

            for cycle in range(cfg.num_cycles):
                k_dev, kc, knc, kall = jax.random.split(k_dev, 4)
                # (C) heated clusters for NMC slots; plain sweeps otherwise
                heat = jnp.where(do_nmc[:, None] & cl,
                                 jnp.asarray(1.0 / cfg.temp_x, dtype), 1.0)
                mask_c = jnp.where(do_nmc[:, None], cl & act, act)
                res = phase(m_local, kc, base_row * heat, mask_c)
                m_local = jnp.where(do_nmc[:, None], res.m_best, res.m)
                track_best(res)

                # (NC) frozen clusters for NMC slots
                mask_nc = jnp.where(do_nmc[:, None], (~cl) & act, act)
                res = phase(m_local, knc, base_row, mask_nc)
                m_local = jnp.where(do_nmc[:, None], res.m_best, res.m)
                track_best(res)

                # (ALL) — NMC slots restart from the phase argmin, exactly
                # like nmc_subroutine (/root/reference/NMC/nmc.py:429-433)
                if cycle % cfg.full_update_frequency == 0:
                    res = phase(m_local, kall, base_row, act)
                    m_local = jnp.where(do_nmc[:, None], res.m_best, res.m)
                    track_best(res)

            # Swap energies must belong to the CARRIED states (the reference
            # recomputes them from m_start, npt.py:657-668); after an
            # m_best restart the last-sweep energy is stale, so recompute.
            phi_c = jnp.matmul(m_local, self.J_full,
                               precision=cfg.precision)
            e_carried = -(0.5 * jnp.sum(m_local * phi_c, axis=-1)
                          + jnp.sum(m_local * self.h, axis=-1))

            e_all = lax.all_gather(e_carried, axis, tiled=True)    # [R]
            swap = metropolis_label_swap(
                k_swap, beta_to_slot, self.beta_list.astype(jnp.float32),
                e_all.astype(jnp.float32), num_pairs=cfg.num_swapping_pairs)
            metrics = RoundMetrics(slot_energies=e_all,
                                   accepted=swap.accepted, pairs=swap.pairs)
            return (m_local, swap.beta_to_slot, swap.slot_to_beta, metrics,
                    mb_local, eb_local, cl, do_nmc)

        shard_map = jax.shard_map

        smapped = shard_map(
            _round, mesh=self.mesh,
            in_specs=(P(axis, None), P(), P(), P(), P(),
                      P(axis, None), P(axis), P(axis, None), P(axis)),
            out_specs=(P(axis, None), P(), P(),
                       RoundMetrics(P(), P(), P()),
                       P(axis, None), P(axis), P(axis, None), P(axis)),
            check_vma=False,
        )

        def round_fn(state: ShardedPTState):
            m, b2s, s2b, metrics, mb, eb, cl, dn = smapped(
                state.m, state.beta_to_slot, state.slot_to_beta, state.key,
                state.round_index, state.m_best, state.e_best,
                state.cl, state.do_nmc_slot)
            new_state = ShardedPTState(
                m=m, beta_to_slot=b2s, slot_to_beta=s2b, key=state.key,
                round_index=state.round_index + 1, m_best=mb, e_best=eb,
                cl=cl, do_nmc_slot=dn)
            return new_state, metrics

        return round_fn

    # ------------------------------------------------------------------
    def round(self, state: ShardedPTState):
        """Run one jitted swap round; returns (state, RoundMetrics)."""
        return self._round_jit(state)

    def run(self, state: ShardedPTState, num_rounds: int):
        metrics = None
        for _ in range(num_rounds):
            state, metrics = self.round(state)
        return state, metrics

    def run_scanned(self, state: ShardedPTState, num_rounds: int):
        """num_rounds swap rounds fused into ONE dispatch (lax.scan over
        the round body) — the production driver on high-dispatch-latency
        links; returns (state, stacked RoundMetrics [num_rounds, ...])."""
        if num_rounds not in self._scan_jit:
            round_fn = self._build_round()

            def scanned(state0):
                def body(s, _):
                    s2, m = round_fn(s)
                    return s2, m
                return jax.lax.scan(body, state0, None, length=num_rounds)

            self._scan_jit[num_rounds] = jax.jit(scanned)
        return self._scan_jit[num_rounds](state)

    def best(self, state: ShardedPTState):
        """(best-ever f32 energy, best state in ORIGINAL spin order), host.
        Multi-host safe: sharded arrays allgather across processes."""
        from .distributed import host_gather
        eb = host_gather(state.e_best)
        i = int(eb.argmin())
        m = host_gather(state.m_best)[i][np.asarray(self.blocked.inv_perm)]
        return float(eb[i]), m

    def save(self, state: ShardedPTState, path: str) -> None:
        """Snapshot a sharded run (states gathered to host, npz)."""
        from ..utils.checkpoint import save_checkpoint
        from .distributed import host_gather
        save_checkpoint(path, ShardedPTState(
            m=host_gather(state.m), beta_to_slot=np.asarray(state.beta_to_slot),
            slot_to_beta=np.asarray(state.slot_to_beta),
            key=np.asarray(state.key),
            round_index=np.asarray(state.round_index),
            m_best=host_gather(state.m_best),
            e_best=host_gather(state.e_best),
            cl=host_gather(state.cl),
            do_nmc_slot=host_gather(state.do_nmc_slot)),
            step=int(state.round_index))

    def restore(self, path: str) -> ShardedPTState:
        from ..utils.checkpoint import load_checkpoint
        snap, _, _ = load_checkpoint(
            path, namedtuple_registry={"ShardedPTState": ShardedPTState})
        sh = NamedSharding(self.mesh, P(self.axis, None))
        sh1 = NamedSharding(self.mesh, P(self.axis))
        return ShardedPTState(
            m=jax.device_put(jnp.asarray(snap.m), sh),
            beta_to_slot=jnp.asarray(snap.beta_to_slot),
            slot_to_beta=jnp.asarray(snap.slot_to_beta),
            key=jnp.asarray(snap.key),
            round_index=jnp.asarray(snap.round_index),
            m_best=jax.device_put(jnp.asarray(snap.m_best), sh),
            e_best=jax.device_put(jnp.asarray(snap.e_best), sh1),
            cl=jax.device_put(jnp.asarray(snap.cl), sh),
            do_nmc_slot=jax.device_put(jnp.asarray(snap.do_nmc_slot), sh1))

    def states_by_temperature(self, state: ShardedPTState) -> np.ndarray:
        """Gather states ordered by temperature index [R, n] (host)."""
        from .distributed import host_gather
        m = host_gather(state.m)[np.asarray(state.beta_to_slot)]
        return m[:, np.asarray(self.blocked.inv_perm)]
