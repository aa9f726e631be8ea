"""End-to-end pipeline: APT schedule -> NPT replica exchange -> evaluation.

Mirrors the reference's workflow where apt_preprocessor.py writes
beta_list_python.npy and npt.py/apt_ICM.py consume it
(/root/reference/NPT/npt.py:725, apt_ICM.py:330).
"""

import itertools

import jax
import numpy as np

from nmc_tpu import (APTConfig, APTICMConfig, NPTConfig, apt_icm_run,
                     apt_preprocess, npt_run)
from nmc_tpu.evaluation import evaluate_solver, make_pt_solver
from nmc_tpu.io.generators import wishart_planted


def test_apt_to_npt_handoff(tmp_path):
    prob, t_planted, gs_raw = wishart_planted(14, alpha=0.7, seed=5)
    norm = float(np.abs(prob.J).max())
    gs_norm = gs_raw / norm

    # 1) APT builds the schedule (artifact written like the reference)
    apt = apt_preprocess(
        prob, APTConfig(num_sweeps_MCMC=40, num_sweeps_read=30, num_rng=8,
                        beta_start=0.4, alpha=1.25, beta_max=6.0,
                        save_dir=str(tmp_path), block_size=16),
        jax.random.PRNGKey(0))
    beta_file = tmp_path / "beta_list_python.npy"
    assert beta_file.exists()
    beta_list = np.load(beta_file)
    assert len(beta_list) >= 3

    # 2) NPT consumes it (NMC on the coldest replica)
    R = len(beta_list)
    doNMC = [False] * (R - 1) + [True]
    res = npt_run(prob, beta_list, doNMC,
                  NPTConfig(num_sweeps_MCMC=60 * R, num_sweeps_read=60 * R,
                            num_swap_attempts=6, num_swapping_pairs=1,
                            num_cycles=1, global_beta=4.0, lambda_start=3.0,
                            tolerance=1e-8, max_iterations=400,
                            block_size=16, record_last_round_m=False),
                  jax.random.PRNGKey(1))
    # planted ground state should be reached on this small instance
    states = np.array(list(itertools.product([-1, 1], repeat=14)), float)
    gs_true = prob.normalized()[0].energy(states).min()
    assert res.min_energy <= gs_true + 1e-4

    # 3) ICM baseline consumes the same schedule
    icm = apt_icm_run(prob.normalized()[0], beta_list[: min(R, 4)],
                      APTICMConfig(num_sweeps_MCMC=24, num_sweeps_read=12,
                                   num_swap_attempts=3, num_subreplicas=2,
                                   block_size=16),
                      jax.random.PRNGKey(2))
    assert np.isfinite(icm.Energy).all()


def test_evaluation_harness_with_planted_instances():
    instances = []
    for seed in (1, 2):
        prob, _, gs = wishart_planted(12, alpha=0.8, seed=seed)
        instances.append((f"wp12_{seed}", prob, gs))
    solver = make_pt_solver(num_replicas=6, beta_min=0.3, beta_max=4.0,
                            sweeps=360, swap_attempts=6, block_size=16)
    report = evaluate_solver(instances, solver)
    assert report.summary()["num_instances"] == 2
    # planted N=12 instances should be solved with this budget
    assert report.hit_rate == 1.0
    json_out = report.to_json()
    assert "hit_rate" in json_out
