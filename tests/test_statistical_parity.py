"""Statistical equivalence against the ACTUAL reference implementation.

Bit-exact trajectory parity across RNG families is impossible
(docs/DEVIATIONS.md #1); what can and must hold is that both frameworks
sample the same equilibrium ensembles. Here the reference NPT runs
in-process (num_cores=1) side by side with this framework's NPT on the
same instance, and the per-replica energy statistics are compared.
"""

import contextlib
import io
import itertools

import jax
import numpy as np
import pytest

from nmc_tpu import NPTConfig, npt_run
from nmc_tpu.core.problem import IsingProblem

from conftest import random_sk


@pytest.mark.slow
def test_npt_energy_statistics_match_reference(rng, reference_npt):
    J, h = random_sk(rng, 10)
    J *= 0.4  # moderate couplings: finite-T energies carry real variance
    h *= 0.4
    beta_list = np.array([0.3, 0.8, 2.5])
    seeds = range(8)

    ref_cold, ours_cold = [], []
    ref_hot, ours_hot = [], []
    for seed in seeds:
        np.random.seed(100 + seed)
        npt = reference_npt.NPT(J.copy(), h.copy())
        with contextlib.redirect_stdout(io.StringIO()):
            _, E_ref = npt.run(
                beta_list=beta_list, num_replicas=3, doNMC=[False] * 3,
                num_sweeps_MCMC=600, num_sweeps_read=600,
                num_swap_attempts=3, num_swapping_pairs=1, num_cores=1,
                use_hash_table=False)
        ref_hot.append(E_ref[0])
        ref_cold.append(E_ref[-1])

        res = npt_run(IsingProblem(J, h), beta_list, [False] * 3,
                      NPTConfig(num_sweeps_MCMC=600, num_sweeps_read=600,
                                num_swap_attempts=3, num_swapping_pairs=1,
                                block_size=16, record_last_round_m=False),
                      jax.random.PRNGKey(seed))
        ours_hot.append(res.Energy[0])
        ours_cold.append(res.Energy[-1])

    # cold replicas find the same ground state
    states = np.array(list(itertools.product([-1, 1], repeat=10)), float)
    norm = np.abs(J).max()
    gs = (IsingProblem(J / norm, h / norm).energy(states)).min()
    assert np.median(ref_cold) == pytest.approx(gs, abs=2e-2)
    assert np.median(ours_cold) == pytest.approx(gs, abs=2e-2)

    # hot-replica energy distributions agree (same equilibrium ensemble):
    # means within 3 pooled standard errors
    r, o = np.array(ref_hot), np.array(ours_hot)
    se = np.sqrt(r.var(ddof=1) / len(r) + o.var(ddof=1) / len(o))
    assert abs(r.mean() - o.mean()) < 3 * se + 1e-9, (r.mean(), o.mean(), se)


@pytest.mark.slow
def test_mcmc_equilibrium_matches_reference_kernel(rng, reference_npt):
    """The raw sweep kernels sample the same Boltzmann ensemble: mean
    equilibrium energy of the reference MCMC vs this engine at fixed beta
    agree within pooled error."""
    from nmc_tpu.ops.engine import SweepEngine

    J, h = random_sk(rng, 8)
    J *= 0.5
    h *= 0.5
    beta = 0.9
    npt = reference_npt.NPT(J.copy(), h.copy())
    prob = IsingProblem(J, h)

    # reference: 6 chains x 400 sweeps, discard half as burn-in
    np.random.seed(7)
    ref_e = []
    for c in range(6):
        m0 = np.sign(np.random.rand(8) - 0.5)
        M = npt.MCMC(400, m0, beta, J, h)
        tail = M[:, 200:]
        e = [-(m @ J @ m / 2 + m @ h) for m in tail.T]
        ref_e.append(np.mean(e))

    eng = SweepEngine(prob, block_size=8)
    m0 = np.asarray(eng.from_blocked(
        eng.init_states(jax.random.PRNGKey(0), 6)))
    res = eng.run(m0, jax.random.PRNGKey(1), num_sweeps=400, beta=beta)
    ours_e = np.asarray(res.energies)[200:].mean(axis=0)

    r, o = np.array(ref_e), np.array(ours_e)
    se = np.sqrt(r.var(ddof=1) / len(r) + o.var(ddof=1) / len(o))
    assert abs(r.mean() - o.mean()) < 3 * se + 1e-9, (r.mean(), o.mean(), se)


@pytest.mark.slow
def test_apt_schedule_statistics_match_reference(rng, tmp_path, monkeypatch):
    """APT beta ladders built by both frameworks on the same instance have
    statistically matching shape (rung count and final beta)."""
    import os
    from conftest import _load_reference_module
    from nmc_tpu import APTConfig, apt_preprocess

    if not os.path.exists("/root/reference/NPT/apt_preprocessor.py"):
        pytest.skip("reference repo not available")
    ref_mod = _load_reference_module("NPT/apt_preprocessor.py", "ref_apt")
    monkeypatch.chdir(tmp_path)  # reference writes artifacts into CWD

    J, h = random_sk(rng, 8)
    params = dict(num_sweeps_MCMC=200, num_sweeps_read=200, num_rng=6,
                  beta_start=0.5, alpha=1.25, beta_max=30.0)

    ref_lens, ref_final = [], []
    for seed in range(4):
        np.random.seed(seed)
        apt = ref_mod.APT_preprocessor(J.copy(), h.copy())
        with contextlib.redirect_stdout(io.StringIO()):
            beta, sigma = apt.run(use_hash_table=0, num_cores=1, **params)
        ref_lens.append(len(beta))
        ref_final.append(float(np.asarray(beta[-1]).item()))

    our_lens, our_final = [], []
    for seed in range(4):
        res = apt_preprocess(IsingProblem(J, h),
                             APTConfig(block_size=8, **params),
                             jax.random.PRNGKey(seed))
        our_lens.append(len(res.beta))
        our_final.append(res.beta[-1])

    # same ladder structure: rung counts within 2 and final betas within
    # 3 pooled standard errors
    assert abs(np.mean(ref_lens) - np.mean(our_lens)) <= 2.0
    r, o = np.array(ref_final), np.array(our_final)
    se = np.sqrt(r.var(ddof=1) / len(r) + o.var(ddof=1) / len(o))
    assert abs(r.mean() - o.mean()) < 3 * se + 0.5, (r.mean(), o.mean(), se)
