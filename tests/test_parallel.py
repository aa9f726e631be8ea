"""Multi-chip paths on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmc_tpu.io.generators import random_sk
from nmc_tpu.parallel import (EnsembleConfig, EnsemblePT, ShardedNPT,
                              ShardedNPTConfig, metropolis_label_swap,
                              select_pairs_device)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestSwapOps:
    def test_select_pairs_non_overlapping(self):
        for seed in range(5):
            picks = np.asarray(select_pairs_device(
                jax.random.PRNGKey(seed), num_replicas=10, num_pairs=3))
            valid = picks[picks >= 0]
            assert len(valid) == 3
            # each pair (b, b+1): no two picks may be adjacent or equal
            for i in range(len(valid)):
                for j in range(i + 1, len(valid)):
                    assert abs(int(valid[i]) - int(valid[j])) >= 2

    def test_select_pairs_exhaustion_returns_minus_one(self):
        picks = np.asarray(select_pairs_device(
            jax.random.PRNGKey(0), num_replicas=3, num_pairs=3))
        assert (picks == -1).sum() >= 1  # only 1 non-overlapping pair exists

    def test_label_swap_preserves_permutation(self):
        R = 8
        b2s = jnp.arange(R, dtype=jnp.int32)
        betas = jnp.linspace(0.5, 3.0, R)
        energies = jax.random.normal(jax.random.PRNGKey(1), (R,)) * 10
        res = metropolis_label_swap(jax.random.PRNGKey(2), b2s, betas,
                                    energies, num_pairs=3)
        b2s_new = np.asarray(res.beta_to_slot)
        s2b_new = np.asarray(res.slot_to_beta)
        assert sorted(b2s_new.tolist()) == list(range(R))
        np.testing.assert_array_equal(s2b_new[b2s_new], np.arange(R))

    def test_swap_always_accepts_favorable(self):
        # hot replica (low beta) holding much lower energy than cold:
        # dB > 0, dE > 0 -> exp > 1 -> always accept
        R = 2
        b2s = jnp.arange(R, dtype=jnp.int32)
        betas = jnp.array([0.1, 5.0])
        energies = jnp.array([-100.0, 0.0])  # slot0 (hot) has lower energy
        accepted = []
        for seed in range(10):
            res = metropolis_label_swap(jax.random.PRNGKey(seed), b2s, betas,
                                        energies, num_pairs=1)
            accepted.append(bool(res.accepted[0]))
        assert all(accepted)


class TestShardedNPT:
    def test_round_runs_on_mesh_and_descends(self):
        prob = random_sk(24, seed=1).normalized()[0]
        beta_list = np.linspace(0.3, 3.0, 16)
        doNMC = [False] * 12 + [True] * 4
        cfg = ShardedNPTConfig(sweeps_per_phase=8, num_cycles=1,
                               num_swapping_pairs=3, global_beta=2.0,
                               block_size=32, lbp_max_iterations=10)
        pt = ShardedNPT(prob, beta_list, doNMC, cfg)
        assert pt.n_dev == 8 and pt.R_local == 2
        state = pt.init_state(jax.random.PRNGKey(0))
        e0 = prob.energy(pt.states_by_temperature(state)).mean()
        state, metrics = pt.run(state, 6)
        # permutation stays consistent
        s2b = np.asarray(state.slot_to_beta)
        b2s = np.asarray(state.beta_to_slot)
        np.testing.assert_array_equal(s2b[b2s], np.arange(16))
        m = pt.states_by_temperature(state)
        assert set(np.unique(m)) <= {-1.0, 1.0}
        assert prob.energy(m).mean() < e0  # sampling lowered energies
        assert np.asarray(metrics.slot_energies).shape == (16,)

    def test_replica_count_must_divide(self):
        prob = random_sk(8, seed=2)
        with pytest.raises(ValueError):
            ShardedNPT(prob, np.linspace(0.5, 2, 9), [False] * 9,
                       ShardedNPTConfig(block_size=8))


class TestEnsemblePT:
    def test_instances_sharded_and_consistent(self):
        problems = [random_sk(20, seed=s).normalized()[0] for s in range(8)]
        beta = np.linspace(0.3, 3.0, 6)
        ens = EnsemblePT(problems, beta,
                         EnsembleConfig(num_replicas=6, sweeps_per_round=10,
                                        num_swapping_pairs=2, block_size=32))
        state = ens.init_state(jax.random.PRNGKey(0))
        state = ens.run(state, 4)
        best = ens.best_states(state)
        assert best.shape == (8, 20)
        for i, p in enumerate(problems):
            assert abs(p.energy(best[i]) - float(state.best_e[i])) < 1e-3

    def test_size_mismatch_raises(self):
        with pytest.raises(ValueError):
            EnsemblePT([random_sk(8, 0), random_sk(10, 1)], [0.5, 1.0])


class TestSpinSharded:
    def test_j_sharded_sweeps_energy_parity_and_descent(self):
        from nmc_tpu.io.generators import ea_2d
        from nmc_tpu.parallel.spin_sharded import (SpinShardedConfig,
                                                   SpinShardedSweeper)
        prob = ea_2d(8, seed=0)  # 64 spins, 2 colors
        sw = SpinShardedSweeper(prob, SpinShardedConfig(block_size=8))
        assert sw.n_dev == 8
        # each device holds 1/8 of the J columns
        assert sw.cols_per_dev * sw.n_dev == sw.n_pad
        state = sw.init_state(jax.random.PRNGKey(0), 16)
        e0 = prob.energy(sw.states(state)).mean()
        state, e = sw.sweeps(state, 30, beta=1.2)
        m = sw.states(state)
        assert set(np.unique(m)) <= {-1.0, 1.0}
        # psum'd energies equal direct evaluation on gathered states
        np.testing.assert_allclose(np.asarray(e), prob.energy(m), atol=1e-3)
        assert np.asarray(e).mean() < e0

    def test_dense_degrades_to_singleton_color_classes(self):
        # a dense graph greedy-colors into singleton classes; the layout is
        # still exact (one real spin per block) just padding-heavy
        from nmc_tpu.parallel.spin_sharded import (SpinShardedConfig,
                                                   SpinShardedSweeper)
        dense = random_sk(16, seed=1)
        sw = SpinShardedSweeper(dense, SpinShardedConfig(block_size=8))
        assert sw.blocked.colored
        assert sw.n_pad == 16 * 8  # one padded block per spin


def test_sharded_npt_run_scanned_matches_structure():
    prob = random_sk(16, seed=5).normalized()[0]
    beta_list = np.linspace(0.4, 2.5, 8)
    cfg = ShardedNPTConfig(sweeps_per_phase=4, num_cycles=1,
                           num_swapping_pairs=2, global_beta=2.0,
                           block_size=16)
    pt = ShardedNPT(prob, beta_list, [False] * 8, cfg)
    state = pt.init_state(jax.random.PRNGKey(0))
    state, metrics = pt.run_scanned(state, 5)
    # stacked metrics over rounds
    assert np.asarray(metrics.slot_energies).shape == (5, 8)
    assert np.asarray(metrics.accepted).shape == (5, 2)
    s2b = np.asarray(state.slot_to_beta)
    b2s = np.asarray(state.beta_to_slot)
    np.testing.assert_array_equal(s2b[b2s], np.arange(8))
    assert int(state.round_index) == 5


def test_sharded_npt_sparse_lbp_mode():
    from nmc_tpu.io.generators import ea_2d
    prob = ea_2d(8, seed=0)
    R = 16
    cfg = ShardedNPTConfig(sweeps_per_phase=6, num_cycles=1,
                           num_swapping_pairs=3, global_beta=2.0,
                           block_size=8, lbp_max_iterations=8,
                           lbp_mode="sparse", lambda_reduction_factor=0.3)
    pt = ShardedNPT(prob, np.linspace(0.3, 3, R), [False] * 12 + [True] * 4,
                    cfg)
    assert pt.lbp_sparse and pt.edge_graph is not None
    state = pt.init_state(jax.random.PRNGKey(0))
    state, metrics = pt.run(state, 2)
    assert np.isfinite(np.asarray(metrics.slot_energies)).all()


def test_sharded_npt_planes_lbp_mode():
    from nmc_tpu.io.generators import ea_2d
    prob = ea_2d(8, seed=0)
    R = 16
    cfg = ShardedNPTConfig(sweeps_per_phase=6, num_cycles=1,
                           num_swapping_pairs=3, global_beta=2.0,
                           block_size=8, lbp_max_iterations=8,
                           lbp_mode="planes", lambda_reduction_factor=0.3)
    pt = ShardedNPT(prob, np.linspace(0.3, 3, R), [False] * 12 + [True] * 4,
                    cfg)
    assert pt.edge_slots is not None and pt._w_slot is not None
    state = pt.init_state(jax.random.PRNGKey(0))
    state, metrics = pt.run(state, 2)
    assert np.isfinite(np.asarray(metrics.slot_energies)).all()


def test_sharded_npt_checkpoint_roundtrip(tmp_path):
    prob = random_sk(16, seed=6).normalized()[0]
    cfg = ShardedNPTConfig(sweeps_per_phase=4, num_cycles=1,
                           num_swapping_pairs=2, block_size=16)
    pt = ShardedNPT(prob, np.linspace(0.4, 2.0, 8), [False] * 8, cfg)
    state = pt.init_state(jax.random.PRNGKey(0))
    state, _ = pt.run(state, 2)
    path = str(tmp_path / "pt.npz")
    pt.save(state, path)
    restored = pt.restore(path)
    np.testing.assert_array_equal(np.asarray(restored.m),
                                  np.asarray(state.m))
    # resumed run continues identically (same key + round_index)
    a, _ = pt.round(state)
    b, _ = pt.round(restored)
    np.testing.assert_array_equal(np.asarray(a.m), np.asarray(b.m))


class TestEnsembleNMC:
    def test_batched_instances_with_nmc(self):
        from nmc_tpu.io.generators import ea_2d
        from nmc_tpu.parallel import EnsembleNMC
        from nmc_tpu.parallel.sharded_pt import ShardedNPTConfig
        probs = [ea_2d(6, seed=s).normalized()[0] for s in range(4)]
        cfg = ShardedNPTConfig(sweeps_per_phase=6, num_cycles=1,
                               num_swapping_pairs=2, use_coloring=True,
                               block_size=16, lbp_mode="dense",
                               lbp_max_iterations=10)
        beta = np.geomspace(0.3, 4.0, 8)
        ens = EnsembleNMC(probs, beta, [False] * 6 + [True] * 2, cfg)
        state = ens.init_state(jax.random.PRNGKey(0))
        state = ens.run_scanned(state, 6)
        eb, mb = ens.best(state)
        assert eb.shape == (4,) and np.isfinite(eb).all()
        # f64 re-evaluation of gathered best states matches the f32 track
        for i, p in enumerate(probs):
            assert abs(float(p.energy(mb[i])) - eb[i]) < 1e-3
        # label permutations stay valid per instance
        b2s = np.asarray(state.beta_to_slot)
        for i in range(4):
            assert sorted(b2s[i].tolist()) == list(range(8))

    def test_ensemble_nmc_planes_lbp(self):
        """lbp_mode='planes' (scatter-free slotted-edge LBP) drives the
        same engine end-to-end: finite energies, valid permutations, and
        energies within noise of the sparse path at matched seeds
        (marginal ulp differences can flip borderline backbone spins, so
        exact trajectory parity is not required — the marginal math
        itself is covered by tests/test_lbp_sparse.py::TestLBPPlanes)."""
        from nmc_tpu.io.generators import ea_2d
        from nmc_tpu.parallel import EnsembleNMC
        from nmc_tpu.parallel.sharded_pt import ShardedNPTConfig
        probs = [ea_2d(6, seed=s).normalized()[0] for s in range(3)]
        beta = np.geomspace(0.3, 4.0, 8)
        res = {}
        for mode in ("sparse", "planes"):
            cfg = ShardedNPTConfig(sweeps_per_phase=6, num_cycles=1,
                                   num_swapping_pairs=2, use_coloring=True,
                                   block_size=16, lbp_mode=mode,
                                   lbp_max_iterations=10)
            ens = EnsembleNMC(probs, beta, [False] * 6 + [True] * 2, cfg)
            if mode == "planes":
                assert ens.edge_slots is not None
            state = ens.init_state(jax.random.PRNGKey(0))
            state = ens.run_scanned(state, 6)
            eb, mb = ens.best(state)
            assert np.isfinite(eb).all()
            for i, p in enumerate(probs):
                assert abs(float(p.energy(mb[i])) - eb[i]) < 1e-3
            res[mode] = eb
        # same seeds, near-identical sampling: best energies land close
        assert np.allclose(res["sparse"], res["planes"], atol=0.2)

    def test_ensemble_nmc_planes_degree_cap(self):
        import pytest
        from nmc_tpu.io.generators import random_sk
        from nmc_tpu.parallel import EnsembleNMC
        from nmc_tpu.parallel.sharded_pt import ShardedNPTConfig
        probs = [random_sk(24, seed=0).normalized()[0]]
        cfg = ShardedNPTConfig(sweeps_per_phase=4, num_cycles=1,
                               block_size=8, lbp_mode="planes",
                               lbp_max_iterations=5)
        with pytest.raises(ValueError, match="degree"):
            EnsembleNMC(probs, np.geomspace(0.3, 2.0, 4),
                        [False] * 3 + [True], cfg)

    def test_ensemble_nmc_auto_routes_planes(self):
        """lbp_mode='auto' (the production default) prefers planes on
        bounded-degree families (r4 hardware A/B: 5.3x the full round,
        results/nmc_phase_breakdown_planes.json) and falls back to the
        edge-list/dense paths — NOT an error — past the degree cap."""
        from nmc_tpu.io.generators import ea_2d, random_sk
        from nmc_tpu.parallel import EnsembleNMC
        from nmc_tpu.parallel.sharded_pt import ShardedNPTConfig
        beta = np.geomspace(0.3, 2.0, 4)
        cfg = ShardedNPTConfig(sweeps_per_phase=4, num_cycles=1,
                               use_coloring=True, block_size=16,
                               lbp_mode="auto", lbp_max_iterations=5)
        ens = EnsembleNMC([ea_2d(6, seed=0).normalized()[0]], beta,
                          [False] * 3 + [True], cfg)
        assert ens.edge_slots is not None          # bounded degree: planes
        cfg_sk = ShardedNPTConfig(sweeps_per_phase=4, num_cycles=1,
                                  block_size=8, lbp_mode="auto",
                                  lbp_max_iterations=5)
        ens_sk = EnsembleNMC([random_sk(24, seed=0).normalized()[0]], beta,
                             [False] * 3 + [True], cfg_sk)
        assert ens_sk.edge_slots is None           # dense family: fallback

    def test_ensemble_nmc_descends(self):
        from nmc_tpu.io.generators import random_sk
        from nmc_tpu.parallel import EnsembleNMC
        from nmc_tpu.parallel.sharded_pt import ShardedNPTConfig
        probs = [random_sk(10, seed=s).normalized()[0] for s in range(2)]
        cfg = ShardedNPTConfig(sweeps_per_phase=8, num_cycles=1,
                               num_swapping_pairs=1, block_size=16,
                               lbp_mode="dense", lbp_max_iterations=10)
        ens = EnsembleNMC(probs, np.geomspace(0.3, 3.0, 6),
                          [False] * 4 + [True] * 2, cfg)
        state = ens.init_state(jax.random.PRNGKey(1))
        s1 = ens.run_scanned(state, 1)
        e1, _ = ens.best(s1)
        s8 = ens.run_scanned(s1, 8)
        e8, _ = ens.best(s8)
        assert (e8 <= e1 + 1e-6).all()


class TestSpinShardedProduction:
    """Round-2 promotion of spin sharding (VERDICT #7): traced beta
    schedules, per-replica beta, masks, 2-D replica x spin meshes, PT
    swap rounds — with mesh-size INVARIANCE as the parity criterion."""

    def _prob(self):
        from nmc_tpu.io.generators import ea_2d
        return ea_2d(8, seed=1)

    def test_spin_mesh_size_invariance(self):
        """Same key => bit-identical trajectory on 1-, 2- and 4-device
        'spin' meshes (sharding must not change the math)."""
        from jax.sharding import Mesh
        from nmc_tpu.parallel import SpinShardedConfig, SpinShardedSweeper
        prob = self._prob()
        cfg = SpinShardedConfig(block_size=8)
        outs = []
        for nd in (1, 2, 4):
            mesh = Mesh(np.array(jax.devices()[:nd]), ("spin",))
            sw = SpinShardedSweeper(prob, cfg, mesh=mesh)
            st = sw.init_state(jax.random.PRNGKey(7), 6)
            st, e = sw.sweeps(st, 5, 1.3)
            outs.append((sw.states(st), np.asarray(e)))
        for states, e in outs[1:]:
            np.testing.assert_array_equal(states, outs[0][0])
            np.testing.assert_allclose(e, outs[0][1], atol=1e-4)

    def test_2d_replica_spin_mesh(self):
        from jax.sharding import Mesh
        from nmc_tpu.parallel import SpinShardedConfig, SpinShardedSweeper
        prob = self._prob()
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                    ("replica", "spin"))
        sw = SpinShardedSweeper(prob, SpinShardedConfig(block_size=8),
                                mesh=mesh, replica_axis="replica")
        st = sw.init_state(jax.random.PRNGKey(3), 8)
        beta_rep = np.geomspace(0.3, 3.0, 8)
        st, e = sw.sweeps(st, 6, 1.0, beta_replica=beta_rep)
        assert e.shape == (8,) and np.isfinite(np.asarray(e)).all()
        # chains at different beta must not be bitwise-identical (distinct
        # streams per replica shard)
        states = sw.states(st)
        assert not np.array_equal(states[0], states[4])

    def test_masks_freeze_spins(self):
        from jax.sharding import Mesh
        from nmc_tpu.parallel import SpinShardedConfig, SpinShardedSweeper
        prob = self._prob()
        mesh = Mesh(np.array(jax.devices()[:4]), ("spin",))
        sw = SpinShardedSweeper(prob, SpinShardedConfig(block_size=8),
                                mesh=mesh)
        st = sw.init_state(jax.random.PRNGKey(5), 4)
        rng = np.random.default_rng(0)
        mask = rng.random((4, sw.n_pad)) < 0.4      # blocked layout
        m_before = np.asarray(st.m)
        st, _ = sw.sweeps(st, 4, 2.0, update_mask=mask)
        m_after = np.asarray(st.m)
        np.testing.assert_array_equal(m_after[~mask], m_before[~mask])

    def test_anneal_and_swap_round(self):
        from jax.sharding import Mesh
        from nmc_tpu.parallel import SpinShardedConfig, SpinShardedSweeper
        prob = self._prob()
        mesh = Mesh(np.array(jax.devices()[:2]), ("spin",))
        sw = SpinShardedSweeper(prob, SpinShardedConfig(block_size=8),
                                mesh=mesh)
        st = sw.init_state(jax.random.PRNGKey(9), 6)
        st, _ = sw.sweeps(st, 8, 2.0, anneal=True)   # linear ramp 0 -> 2
        beta_list = np.geomspace(0.3, 4.0, 6)
        for _ in range(4):
            st, e = sw.swap_round(st, 4, beta_list, num_swapping_pairs=2)
        b2s = np.asarray(st.beta_to_slot)
        assert sorted(b2s.tolist()) == list(range(6))
        s2b = np.asarray(st.slot_to_beta)
        np.testing.assert_array_equal(s2b[b2s], np.arange(6))


class TestEnsembleICM:
    def test_batched_icm_finds_ground_states(self):
        import itertools
        from nmc_tpu.io.generators import random_sk
        from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
        probs = [random_sk(10, seed=s).normalized()[0] for s in range(3)]
        gs = []
        for p in probs:
            states = np.array(list(itertools.product([-1, 1], repeat=10)),
                              float)
            gs.append(float(p.energy(states).min()))
        cfg = EnsembleICMConfig(sweeps_per_round=10, num_subreplicas=4,
                                num_swapping_pairs=1, block_size=16)
        ens = EnsembleICM(probs, np.geomspace(0.4, 3.0, 6), cfg)
        state = ens.init_state(jax.random.PRNGKey(0))
        state = ens.run_scanned(state, 25)
        eb, mb = ens.best(state)
        for i, p in enumerate(probs):
            assert abs(float(p.energy(mb[i])) - eb[i]) < 1e-3
            assert eb[i] <= gs[i] + 1e-4, f"instance {i}: {eb[i]} vs {gs[i]}"
        assert int(np.asarray(state.icm_moves).sum()) > 0

    def test_blocked_houdayer_trajectory_parity(self):
        """houdayer='blocked'/'matmul' must produce the EXACT same
        trajectory as houdayer='sparse' at the same seed — identical
        fixed-point labels imply identical cluster draws."""
        from nmc_tpu.io.generators import ea_2d
        from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
        probs = [ea_2d(5, seed=s) for s in range(2)]
        beta = np.geomspace(0.3, 2.5, 6)
        states = {}
        for mode in ("sparse", "blocked", "matmul", "auto"):
            cfg = EnsembleICMConfig(sweeps_per_round=6, num_subreplicas=4,
                                    num_swapping_pairs=1, block_size=8,
                                    houdayer=mode)
            ens = EnsembleICM(probs, beta, cfg)
            if mode == "blocked":
                assert ens._houd_tiles is not None
            if mode in ("matmul", "auto"):
                # ea_2d degree 4 <= 16: auto must pick the matmul planes
                assert ens._houd_planes is not None
            st = ens.init_state(jax.random.PRNGKey(3))
            states[mode] = ens.run_scanned(st, 8)
        a = states["sparse"]
        for mode in ("blocked", "matmul", "auto"):
            b = states[mode]
            np.testing.assert_array_equal(np.asarray(a.m), np.asarray(b.m))
            np.testing.assert_array_equal(np.asarray(a.beta_to_slot),
                                          np.asarray(b.beta_to_slot))
            np.testing.assert_array_equal(np.asarray(a.e_best),
                                          np.asarray(b.e_best))
            np.testing.assert_array_equal(np.asarray(a.icm_moves),
                                          np.asarray(b.icm_moves))
        assert int(np.asarray(a.icm_moves).sum()) > 0

    def test_matmul_houdayer_degree_cap(self):
        """houdayer='matmul' on a dense (complete-graph) instance must
        raise (degree cap), and 'auto' must fall back to sparse."""
        import pytest
        from nmc_tpu.io.generators import random_sk
        from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
        probs = [random_sk(24, seed=0)]
        beta = np.geomspace(0.3, 2.0, 4)
        with pytest.raises(ValueError, match="degree"):
            EnsembleICM(probs, beta,
                        EnsembleICMConfig(sweeps_per_round=4,
                                          num_subreplicas=2, block_size=8,
                                          houdayer="matmul"))
        ens = EnsembleICM(probs, beta,
                          EnsembleICMConfig(sweeps_per_round=4,
                                            num_subreplicas=2, block_size=8,
                                            houdayer="auto"))
        assert ens._houd_planes is None   # fell back to sparse

    def test_icm_label_permutations_valid(self):
        from nmc_tpu.io.generators import ea_2d
        from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
        probs = [ea_2d(4, seed=s) for s in range(2)]
        cfg = EnsembleICMConfig(sweeps_per_round=4, num_subreplicas=4,
                                num_swapping_pairs=2, block_size=8,
                                use_coloring=True)
        ens = EnsembleICM(probs, np.geomspace(0.3, 2.0, 5), cfg)
        state = ens.init_state(jax.random.PRNGKey(1))
        state = ens.run_scanned(state, 5)
        b2s = np.asarray(state.beta_to_slot)
        for i in range(2):
            for s in range(4):
                assert sorted(b2s[i, s].tolist()) == list(range(5))
