"""Gibbs sweep engine: exactness, invariants, masks, schedules."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmc_tpu.core.problem import IsingProblem, block_problem
from nmc_tpu.ops.coloring import color_groups, num_colors
from nmc_tpu.ops.engine import SweepEngine
from nmc_tpu.ops.sweeps import anneal_schedule

from conftest import random_sk


def boltzmann(problem, beta):
    n = problem.n
    states = np.array(list(itertools.product([-1, 1], repeat=n)), float)
    E = problem.energy(states)
    p = np.exp(-beta * E)
    return states, p / p.sum()


def empirical_tv(problem, beta, engine, burn=100, sweeps=400, replicas=256, seed=0):
    states, p = boltzmann(problem, beta)
    n = problem.n
    m0 = np.asarray(engine.from_blocked(engine.init_states(jax.random.PRNGKey(seed), replicas)))
    res = engine.run(m0, jax.random.PRNGKey(seed + 1), num_sweeps=sweeps,
                     beta=beta, record_m=True)
    M = np.asarray(res.M)[burn:].reshape(-1, n)
    weights = 2 ** np.arange(n)[::-1]
    idx = (((M + 1) / 2) @ weights).astype(int)
    sidx = (((states + 1) / 2) @ weights).astype(int)
    counts = np.bincount(idx, minlength=2 ** n).astype(float)
    counts /= counts.sum()
    target = np.zeros(2 ** n)
    target[sidx] = p
    return float(np.abs(counts - target).sum() / 2)


class TestExactness:
    def test_sequential_dense_matches_boltzmann(self, rng):
        J, h = random_sk(rng, 4)
        prob = IsingProblem(J, 0.3 * h)
        eng = SweepEngine(prob, block_size=8)
        assert empirical_tv(prob, 0.8, eng) < 0.03

    def test_sequential_small_blocks_matches_boltzmann(self, rng):
        J, h = random_sk(rng, 4)
        prob = IsingProblem(J, 0.3 * h)
        eng = SweepEngine(prob, block_size=2)
        assert empirical_tv(prob, 0.8, eng) < 0.03

    def test_colored_jacobi_matches_boltzmann(self, rng):
        # 5-cycle: odd cycle, 3 colors
        n = 5
        J = np.zeros((n, n))
        for i in range(n):
            j = (i + 1) % n
            J[i, j] = J[j, i] = rng.normal()
        prob = IsingProblem(J, 0.4 * rng.normal(size=n))
        eng = SweepEngine(prob, block_size=8, use_coloring=True)
        assert eng.within_block == "jacobi"
        assert eng.blocked.colored
        assert empirical_tv(prob, 0.9, eng) < 0.03

    def test_random_block_order_matches_boltzmann(self, rng):
        J, h = random_sk(rng, 4)
        prob = IsingProblem(J, 0.3 * h)
        eng = SweepEngine(prob, block_size=2, block_order="random")
        assert empirical_tv(prob, 0.8, eng) < 0.03


class TestInvariants:
    def test_phi_consistency_and_energy(self, rng):
        J, h = random_sk(rng, 37)
        prob = IsingProblem(J, h)
        eng = SweepEngine(prob, block_size=16)
        m0 = eng.from_blocked(eng.init_states(jax.random.PRNGKey(0), 4))
        res = eng.run(m0, jax.random.PRNGKey(1), num_sweeps=50, beta=1.0)
        m = np.asarray(res.m)
        assert set(np.unique(m)) <= {-1.0, 1.0}
        # recorded last energy equals direct evaluation (float32 drift bound)
        np.testing.assert_allclose(np.asarray(res.energies[-1]), prob.energy(m),
                                   rtol=0, atol=1e-3)
        assert np.all(np.asarray(res.e_best) <= np.asarray(res.energies[-1]) + 1e-5)

    def test_running_best_matches_trace_min(self, rng):
        J, h = random_sk(rng, 12)
        prob = IsingProblem(J, h)
        eng = SweepEngine(prob, block_size=8)
        m0 = eng.from_blocked(eng.init_states(jax.random.PRNGKey(2), 3))
        res = eng.run(m0, jax.random.PRNGKey(3), num_sweeps=80, beta=1.5,
                      record_m=True)
        e = np.asarray(res.energies)  # [T, R]
        np.testing.assert_allclose(np.asarray(res.e_best), e.min(axis=0),
                                   atol=1e-4)
        # m_best really attains e_best
        np.testing.assert_allclose(prob.energy(np.asarray(res.m_best)),
                                   np.asarray(res.e_best), atol=1e-3)

    def test_update_mask_freezes_spins(self, rng):
        J, h = random_sk(rng, 20)
        prob = IsingProblem(J, h)
        eng = SweepEngine(prob, block_size=8)
        m0 = np.asarray(eng.from_blocked(eng.init_states(jax.random.PRNGKey(4), 4)))
        mask = np.zeros(20, bool)
        mask[:7] = True
        res = eng.run(m0, jax.random.PRNGKey(5), num_sweeps=30, beta=0.5,
                      update_mask=mask)
        m = np.asarray(res.m)
        assert np.array_equal(m[:, 7:], m0[:, 7:])
        assert np.any(m[:, :7] != m0[:, :7])

    def test_beta_spin_heating_changes_statistics(self, rng):
        # heated spins (tiny effective beta) should flip ~50/50 regardless of J
        J, h = random_sk(rng, 10)
        prob = IsingProblem(J, h)
        eng = SweepEngine(prob, block_size=8)
        m0 = np.asarray(eng.from_blocked(eng.init_states(jax.random.PRNGKey(6), 64)))
        beta_spin = np.full(10, 1e-6)
        res = eng.run(m0, jax.random.PRNGKey(7), num_sweeps=50, beta=5.0,
                      beta_spin=beta_spin, record_m=True)
        mean_mag = np.abs(np.asarray(res.M).mean())
        assert mean_mag < 0.05


class TestSchedules:
    def test_anneal_schedule_matches_reference_indexing(self):
        # Reproduce /root/reference/NMC/nmc.py:56-69 in pure python
        def ref_schedule(num_sweeps, beta, initial_beta, spb):
            num_betas = num_sweeps // spb
            vals = np.linspace(initial_beta, beta, num_betas)
            out = np.zeros(num_sweeps)
            idx = 0
            for jj in range(num_sweeps):
                if jj % spb == 0 and idx < num_betas - 1:
                    idx += 1
                out[jj] = vals[idx]
            return out

        for (T, b, b0, spb) in [(10, 2.5, 0.0, 1), (10, 2.5, 0.5, 3),
                                (7, 1.0, 0.0, 2), (5, 3.0, 0.0, 5)]:
            ours = np.asarray(anneal_schedule(T, b, b0, spb, dtype=jnp.float64))
            np.testing.assert_allclose(ours, ref_schedule(T, b, b0, spb),
                                       rtol=1e-12)


class TestBlocking:
    def test_block_problem_roundtrip(self, rng):
        J, h = random_sk(rng, 19)
        prob = IsingProblem(J, h)
        b = block_problem(prob, block_size=8)
        assert b.n_pad == 24 and b.num_blocks == 3
        x = rng.normal(size=(3, 19))
        np.testing.assert_allclose(b.from_blocked(b.to_blocked(x)), x)
        # J reconstructs
        Jfull = b.J_rows.reshape(b.n_pad, b.n_pad)
        act = np.flatnonzero(b.active)
        np.testing.assert_allclose(
            Jfull[np.ix_(act, act)],
            prob.J[np.ix_(b.perm[act], b.perm[act])].astype(np.float32),
            rtol=1e-6,
        )

    def test_color_groups_partition_and_independence(self, rng):
        n = 16
        J = np.zeros((n, n))
        # 2D 4x4 grid (bipartite)
        for i in range(4):
            for j in range(4):
                a = i * 4 + j
                for (di, dj) in [(0, 1), (1, 0)]:
                    ii, jj = i + di, j + dj
                    if ii < 4 and jj < 4:
                        b_ = ii * 4 + jj
                        J[a, b_] = J[b_, a] = rng.normal()
        groups = color_groups(J)
        assert num_colors(J) == 2
        flat = np.concatenate(groups)
        assert sorted(flat.tolist()) == list(range(n))
        for g in groups:
            assert not np.any(J[np.ix_(g, g)])


class TestSparsePhi:
    def test_sparse_tiles_structure(self, rng):
        from nmc_tpu.core.problem import IsingProblem, block_problem, \
            block_sparse_tiles
        from nmc_tpu.io.generators import ea_2d
        from nmc_tpu.ops.coloring import color_groups
        prob = ea_2d(8, seed=0)
        b = block_problem(prob, block_size=8, groups=color_groups(prob.J))
        col_idx, J_tiles = block_sparse_tiles(b)
        nB, K = col_idx.shape
        assert K < nB  # genuinely sparse
        # reconstruct J from tiles and compare
        B = b.block_size
        J_rec = np.zeros((b.n_pad, b.n_pad), dtype=J_tiles.dtype)
        for bb in range(nB):
            for k in range(K):
                j = col_idx[bb, k]
                J_rec[bb * B:(bb + 1) * B, j * B:(j + 1) * B] += J_tiles[bb, k]
        np.testing.assert_allclose(J_rec, b.J_rows.reshape(b.n_pad, b.n_pad))

    def test_sparse_phi_trajectory_equals_dense(self, rng):
        # same key => same uniforms => identical trajectories iff the
        # sparse phi update is exact
        from nmc_tpu.io.generators import ea_2d
        prob = ea_2d(8, seed=1)
        dense = SweepEngine(prob, block_size=8, use_coloring=True,
                            sparse_phi=False)
        sparse = SweepEngine(prob, block_size=8, use_coloring=True,
                             sparse_phi=True)
        assert sparse.sparse_tiles is not None and dense.sparse_tiles is None
        m0 = np.asarray(dense.from_blocked(
            dense.init_states(jax.random.PRNGKey(0), 4)))
        a = dense.run(m0, jax.random.PRNGKey(1), num_sweeps=20, beta=1.0)
        b = sparse.run(m0, jax.random.PRNGKey(1), num_sweeps=20, beta=1.0)
        np.testing.assert_array_equal(np.asarray(a.m), np.asarray(b.m))
        np.testing.assert_allclose(np.asarray(a.energies),
                                   np.asarray(b.energies), atol=1e-4)
