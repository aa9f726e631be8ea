"""Portfolio solver tests: staged presolve -> spectral -> seeded-MCMC solve
of single instances through both the Python API (nmc_tpu.portfolio_solve)
and the CLI (`python -m nmc_tpu solve`). The portfolio is the one-command
surface over the reference's four hand-picked driver scripts
(/root/reference/NMC/nmc.py:442, NPT/npt.py:535, NPT/apt_ICM.py:145)."""

import itertools
import json
import os

import numpy as np
import pytest

WISHART = ("/root/reference/NPT/examples/wishart_small/"
           "wishart_planting_N_10_alpha_0.50")


def _brute_force_gs(prob):
    n = prob.n
    assert n <= 16
    best = np.inf
    best_s = None
    for bits in itertools.product((-1.0, 1.0), repeat=n):
        s = np.array(bits)
        e = float(prob.energy(s))
        if e < best:
            best, best_s = e, s
    return best, best_s


def test_portfolio_spectral_stage_hits_planted():
    from nmc_tpu import portfolio_solve
    from nmc_tpu.io.generators import wishart_planted

    prob, t, gs = wishart_planted(24, 0.5, seed=3)
    res = portfolio_solve(prob, gs, name="w24", sweeps=0,
                          dm_starts=256, dm_iters=800)
    assert res.hit
    assert [s.stage for s in res.stages] == ["presolve", "spectral"]
    # the returned state reproduces the reported energy in f64
    assert abs(float(prob.energy(res.state)) - res.energy_raw) < 1e-9
    assert res.energy_raw <= gs + 1e-9


def test_portfolio_mcmc_fallback_exact_small(rng):
    """Spectral disabled: the seeded-ICM fallback must find the exact
    brute-forced ground state of a random SK-12."""
    from nmc_tpu import IsingProblem, portfolio_solve

    J = rng.normal(size=(12, 12))
    J = 0.5 * (J + J.T)
    np.fill_diagonal(J, 0.0)
    prob = IsingProblem(J, np.zeros(12))
    gs, _ = _brute_force_gs(prob)
    res = portfolio_solve(prob, gs, name="sk12", sweeps=4000,
                          spectral=False,
                          mcmc_overrides=dict(replicas=8, chunk_rounds=2))
    assert res.hit
    assert res.stages[-1].stage == "mcmc:icm"
    assert abs(float(prob.energy(res.state)) - res.energy_raw) < 1e-9
    assert res.energy_raw <= gs + 1e-6


def test_portfolio_presolve_back_substitution():
    """Leaves peeled by the presolve come back via back-substitution:
    the full-space state must reproduce the reported raw energy."""
    from nmc_tpu import portfolio_solve
    from nmc_tpu.io.generators import contrived_wishart_backbone

    prob, t, gs = contrived_wishart_backbone(8, alpha=0.5, seed=2,
                                             tree_depth=2)
    res = portfolio_solve(prob, None, name="cwb8", sweeps=2000,
                          dm_starts=64, dm_iters=200,
                          mcmc_overrides=dict(replicas=8, chunk_rounds=2))
    pres = res.stages[0]
    assert pres.stage == "presolve"
    assert pres.detail["core_n"] < prob.n          # trees actually peeled
    assert res.state.shape == (prob.n,)
    assert set(np.unique(res.state)) <= {-1.0, 1.0}
    assert abs(float(prob.energy(res.state)) - res.energy_raw) < 1e-9


def test_portfolio_unknown_target_spends_budget():
    from nmc_tpu import portfolio_solve
    from nmc_tpu.io.generators import random_sk

    prob = random_sk(16, seed=5)
    res = portfolio_solve(prob, None, name="sk16", sweeps=2000,
                          dm_starts=32, dm_iters=100,
                          mcmc_overrides=dict(replicas=8, chunk_rounds=2))
    assert not res.hit                  # no target -> hit stays False
    assert res.target_raw is None
    assert np.isfinite(res.energy_raw)
    assert res.stages[-1].stage == "mcmc:icm"


@pytest.mark.skipif(not os.path.isdir(WISHART),
                    reason="reference wishart_small not present")
def test_solve_cli_auto_target(tmp_path):
    """CLI end-to-end: dialect + ground-truth auto-detected from the
    folder, JSON record emitted, state written and consistent."""
    from nmc_tpu.cli import main

    inst = os.path.join(WISHART, "wishart_planting_N_10_alpha_0.50_inst_1.txt")
    out = str(tmp_path / "solve.jsonl")
    state_f = str(tmp_path / "state.txt")
    rc = main(["solve", inst, "--sweeps", "2000", "--dm-starts", "64",
               "--dm-iters", "200", "--out", out, "--save-state", state_f])
    assert rc == 0
    rec = json.loads(open(out).readline())
    assert rec["kind"] == "wishart"
    assert rec["target_raw"] is not None
    assert rec["hit"]                    # N=10 alpha=0.5 is trivially easy
    s = np.loadtxt(state_f)
    assert s.shape == (rec["n"],)

    from nmc_tpu.evaluation import wishart_folder_instances
    name, prob, gs = next(iter(wishart_folder_instances(WISHART, limit=1)))
    assert abs(float(prob.energy(s)) - rec["energy_raw"]) < 1e-9


def test_portfolio_spectral_auto_gates_sparse():
    """spectral='auto' skips the eigh/DM stage on bounded-degree graphs
    (spectral visibility is a dense-low-rank phenomenon) and keeps it on
    dense cores."""
    from nmc_tpu import portfolio_solve
    from nmc_tpu.io.generators import ea_2d, wishart_planted

    sparse = ea_2d(5, seed=0)                     # max degree 4
    res = portfolio_solve(sparse, None, sweeps=0)
    assert [s.stage for s in res.stages] == ["presolve"]
    res = portfolio_solve(sparse, None, sweeps=0, spectral=True,
                          dm_starts=16, dm_iters=50)
    assert "spectral" in [s.stage for s in res.stages]

    dense, _, _ = wishart_planted(20, 0.5, seed=0)   # max degree 19
    res = portfolio_solve(dense, None, sweeps=0, dm_starts=16, dm_iters=50)
    assert "spectral" in [s.stage for s in res.stages]
