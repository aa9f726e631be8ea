"""Reference behavioral quirks (SURVEY.md list) + RNG discipline + dtypes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmc_tpu import NMCConfig, NPTConfig, nmc_run, npt_run
from nmc_tpu.core.problem import IsingProblem
from nmc_tpu.io.generators import random_sk
from nmc_tpu.ops.engine import SweepEngine


def test_quirk1_nmc_replicas_run_at_global_beta(monkeypatch):
    """SURVEY quirk 1: NPT's NMC replicas sample at global_beta, ignoring
    their tempering beta (/root/reference/NPT/npt.py:126)."""
    captured = {}
    import nmc_tpu.models.npt as npt_mod
    orig = npt_mod.nmc_subroutine

    def spy(engine, problem, m_star, key, cfg, **kw):
        captured["global_beta"] = cfg.global_beta
        return orig(engine, problem, m_star, key, cfg, **kw)

    monkeypatch.setattr(npt_mod, "nmc_subroutine", spy)
    prob = random_sk(10, seed=1)
    npt_run(prob, [0.1, 0.2], [False, True],
            NPTConfig(num_sweeps_MCMC=24, num_sweeps_read=24,
                      num_swap_attempts=2, num_cycles=1, global_beta=7.5,
                      lambda_start=3.0, tolerance=1e-8, max_iterations=300,
                      block_size=16, record_last_round_m=False),
            jax.random.PRNGKey(0))
    assert captured["global_beta"] == 7.5  # not 0.2


def test_quirk6_acceptance_rate_is_round_fraction():
    """SURVEY quirk 6: acceptance = fraction of rounds with >=1 swap."""
    from nmc_tpu.models.npt import NPTResult
    counts = np.array([0, 2, 1, 0.0])
    res = NPTResult(M=None, Energy=np.zeros(2), energy_trace=np.zeros((2, 1)),
                    min_energy=0.0, best_state=np.zeros(2),
                    swap_counts=counts, swap_attempted=np.zeros((4, 2)),
                    swap_accepted=np.zeros((4, 2)),
                    beta_list=np.array([1.0, 2.0]), norm_factor=1.0)
    assert res.acceptance_rate == 0.5  # 2 of 4 rounds, NOT 3/8 pair-rate


def test_quirk10_compat_normalization_idempotent():
    """SURVEY quirk 10: in-place J normalization; re-running re-normalizes
    (idempotent because max|J| becomes 1)."""
    from nmc_tpu.compat import NMC
    rng = np.random.default_rng(0)
    J = rng.normal(size=(8, 8)) * 5
    J = 0.5 * (J + J.T)
    np.fill_diagonal(J, 0)
    nmc = NMC(J, np.zeros(8)).seed(0)
    kwargs = dict(num_sweeps_initial=20, num_sweeps_per_NMC_phase=10,
                  num_NMC_cycles=1, lambda_start=3.0, max_iterations=300,
                  tolerance=1e-8)
    nmc.run(**kwargs)
    assert abs(np.abs(nmc.J).max() - 1.0) < 1e-12
    J_after_first = nmc.J.copy()
    nmc.run(**kwargs)
    np.testing.assert_allclose(nmc.J, J_after_first, rtol=1e-12)


def test_rng_chain_independence(rng):
    """Batched chains draw independent streams: same start, different
    trajectories, near-zero cross-chain correlation."""
    J, h = np.zeros((16, 16)), np.zeros(16)  # free spins: pure coin flips
    prob = IsingProblem(J, h)
    eng = SweepEngine(prob, block_size=16)
    m0 = np.ones((2, 16))
    res = eng.run(m0, jax.random.PRNGKey(3), num_sweeps=200, beta=1.0,
                  record_m=True)
    M = np.asarray(res.M)  # [T, 2, 16]
    a, b = M[:, 0, :].ravel(), M[:, 1, :].ravel()
    assert not np.array_equal(a, b)
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.05


def test_rng_different_keys_differ(rng):
    J, h = random_sk(12, seed=2).J, np.zeros(12)
    prob = IsingProblem(J, h)
    eng = SweepEngine(prob, block_size=16)
    m0 = np.ones((1, 12))
    a = eng.run(m0, jax.random.PRNGKey(1), num_sweeps=30, beta=0.5)
    b = eng.run(m0, jax.random.PRNGKey(2), num_sweeps=30, beta=0.5)
    assert not np.array_equal(np.asarray(a.m), np.asarray(b.m))


def test_float64_mode_end_to_end():
    prob = random_sk(10, seed=4)
    cfg = NMCConfig(num_sweeps_initial=30, num_sweeps_per_NMC_phase=20,
                    num_NMC_cycles=1, global_beta=1.5, dtype="float64",
                    block_size=16, record_m=False, lambda_start=3.0,
                    tolerance=1e-10, max_iterations=300)
    res = nmc_run(prob, cfg, jax.random.PRNGKey(0))
    # f64 device energies match the exact host re-evaluation tightly
    np.testing.assert_allclose(res.min_energy,
                               prob.normalized()[0].energy(res.m_best),
                               rtol=1e-12)
