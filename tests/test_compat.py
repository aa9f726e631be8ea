"""Reference-API compatibility: same constructors, run signatures, shapes,
artifacts as /root/reference (mirrors the reference's own unittest checks)."""

import os

import numpy as np
import pytest

from nmc_tpu.compat import APT_ICM, APT_preprocessor, LRUFieldCache, NMC, NPT
from nmc_tpu.compat.faithful import mcmc_sequential


def random_J_h(N, seed=0):
    rng = np.random.default_rng(seed)
    J = np.zeros((N, N))
    iu = np.triu_indices(N, 1)
    J[iu] = rng.normal(size=len(iu[0]))
    J = J + J.T
    h = rng.normal(size=N)
    return J, h


@pytest.fixture(autouse=True)
def chdir_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


class TestNMCCompat:
    def test_initialization(self):
        J, h = random_J_h(10)
        nmc = NMC(J, h.reshape(-1, 1))
        assert np.array_equal(nmc.J, J)
        assert np.array_equal(nmc.h, h)

    def test_run_method_shapes_and_artifacts(self):
        J, h = random_J_h(10, seed=1)
        nmc = NMC(J, h).seed(0)
        M, e, min_e = nmc.run(
            num_sweeps_initial=100, num_sweeps_per_NMC_phase=10,
            num_NMC_cycles=2, full_update_frequency=1, M_skip=1, temp_x=20,
            global_beta=3, lambda_start=3, lambda_end=0.01,
            lambda_reduction_factor=0.9, threshold_initial=0.9999999,
            threshold_cutoff=0.999999, max_iterations=10,
            tolerance=np.finfo(float).eps, use_hash_table=False)
        assert isinstance(M, np.ndarray)
        assert M.shape == (10, 60)          # 2 cycles x 3 phases x 10 sweeps
        assert e.shape == (60,)
        assert isinstance(min_e, float)
        assert min_e == e.min()
        assert os.path.exists("NMC_spins.png")
        assert os.path.exists("NMC_energy.png")
        # in-place normalization is observable, like the reference
        assert abs(np.abs(nmc.J).max() - 1.0) < 1e-12

    def test_mcmc_method(self):
        J, h = random_J_h(8, seed=2)
        nmc = NMC(J, h).seed(0)
        M = nmc.MCMC(5, np.ones(8), 1.0, J, h)
        assert M.shape == (8, 5)
        assert set(np.unique(M)) <= {-1.0, 1.0}

    def test_mcmc_hash_table_path(self):
        J, h = random_J_h(6, seed=3)
        nmc = NMC(J, h).seed(0)
        table = LRUFieldCache(maxsize=100)
        M = nmc.MCMC(4, np.ones(6), 1.0, J, h, hash_table=table,
                     use_hash_table=True)
        assert M.shape == (6, 4)
        assert len(table) > 0
        with pytest.raises(ValueError):
            nmc.MCMC(2, np.ones(6), 1.0, J, h, hash_table={},
                     use_hash_table=True)


class TestNPTCompat:
    def test_run_method(self):
        N = 10
        J, h = random_J_h(N, seed=4)
        npt = NPT(J, h.reshape(-1, 1)).seed(0)
        beta_list = np.array([0.5, 1.0, 1.5, 2.0])
        M, Energy = npt.run(
            beta_list=beta_list, num_replicas=4,
            doNMC=[False, False, True, True], num_sweeps_MCMC=100,
            num_sweeps_read=100, num_swap_attempts=10, num_swapping_pairs=1,
            num_cycles=2, full_update_frequency=1, M_skip=1, temp_x=20,
            global_beta=1 / 0.366838 * 5, lambda_start=3, lambda_end=0.01,
            lambda_reduction_factor=0.9, threshold_initial=0.9999999,
            threshold_cutoff=0.999999, max_iterations=100,
            tolerance=1e-10, use_hash_table=False, num_cores=1)
        assert M.shape == (N * 4, 100 // 10)
        assert Energy.shape == (4,)
        assert os.path.exists("NPT_energy.png")


class TestAPTPreprocessorCompat:
    def test_run_and_artifacts(self):
        J, h = random_J_h(8, seed=5)
        apt = APT_preprocessor(J, h.reshape(-1, 1)).seed(0)
        beta, sigma = apt.run(num_sweeps_MCMC=30, num_sweeps_read=20,
                              num_rng=5, beta_start=0.5, alpha=2.0,
                              sigma_E_val=1000, beta_max=5.0,
                              use_hash_table=0, num_cores=1)
        assert isinstance(beta, list) and isinstance(sigma, list)
        assert os.path.exists("beta_list_python.npy")
        assert os.path.exists("sigma_list_python.npy")
        assert os.path.exists("beta_sigma.png")
        assert os.path.exists(os.path.join("Results", "data",
                                           "Energy_iter_1.npy"))
        np.testing.assert_allclose(np.load("beta_list_python.npy"), beta)

    def test_negative_sweeps_raises(self):
        J, h = random_J_h(6, seed=6)
        apt = APT_preprocessor(J, h)
        with pytest.raises(ValueError):
            apt.run(num_sweeps_MCMC=-100, num_rng=2)


class TestAPTICMCompat:
    def test_run_method(self):
        N = 10
        J, h = random_J_h(N, seed=7)
        norm = np.abs(J).max()
        icm = APT_ICM(J / norm, h / norm).seed(0)
        beta_list = np.array([0.5, 1.0, 1.5, 2.0])
        M, Energy = icm.run(beta_list, num_replicas=4, num_sweeps_MCMC=100,
                            num_sweeps_read=100, num_swap_attempts=10,
                            num_swapping_pairs=1, use_hash_table=0,
                            num_cores=1)
        # reference asserts (N*R, num_sweeps_MCMC): per_swap * 10 subreplicas
        assert M.shape == (N * 4, icm.num_sweeps_MCMC)
        assert Energy.shape == (4,)
        assert os.path.exists("APT_ICM_energy..png")

    def test_find_disagreement_clusters(self):
        J, h = random_J_h(8, seed=8)
        icm = APT_ICM(J, h)
        s1 = np.sign(np.random.default_rng(0).normal(size=8))
        s2 = -s1
        clusters = icm.find_disagreement_clusters(s1, s2, J)
        assert sorted(sum(clusters, [])) == list(range(8))


class TestFaithfulKernel:
    def test_incremental_matches_direct(self):
        J, h = random_J_h(9, seed=9)
        m0 = np.sign(np.random.default_rng(1).normal(size=9))
        M1 = mcmc_sequential(6, m0, 0.8, J, h,
                             rng=np.random.default_rng(42), incremental=True)
        M2 = mcmc_sequential(6, m0, 0.8, J, h,
                             rng=np.random.default_rng(42), incremental=False)
        np.testing.assert_array_equal(M1, M2)

    def test_hash_table_trajectory_identical(self):
        J, h = random_J_h(7, seed=10)
        m0 = np.sign(np.random.default_rng(2).normal(size=7))
        table = LRUFieldCache(maxsize=50)
        M1 = mcmc_sequential(5, m0, 1.2, J, h, hash_table=table,
                             use_hash_table=True,
                             rng=np.random.default_rng(7))
        M2 = mcmc_sequential(5, m0, 1.2, J, h,
                             rng=np.random.default_rng(7))
        np.testing.assert_array_equal(M1, M2)
        assert table.hits + table.misses > 0

    def test_lru_eviction(self):
        table = LRUFieldCache(maxsize=2)
        for i in range(4):
            table.store(np.array([float(i)]), np.array([i]))
        assert len(table) == 2
        assert table.lookup(np.array([0.0])) is None
        assert table.lookup(np.array([3.0])) is not None
