"""The tree tier's product surfaces (nmc_tpu/refine.py): the
single-instance `tree_refine_state` API, the `portfolio_solve` tree
stage (incl. the auto layout probe on non-grid instances), and the
`python -m nmc_tpu refine` CLI. Family-sweep behavior
(`refine_family`) is exercised through the CLI path against the
shipped chimera128 truths (/root/reference/NMC/examples/
Chimera_droplet_instances/chimera128_spinglass_power)."""

import json
import os

import numpy as np
import pytest

from nmc_tpu.core.problem import IsingProblem
from nmc_tpu.refine import tree_refine_state

CHIMERA128 = ("/root/reference/NMC/examples/Chimera_droplet_instances/"
              "chimera128_spinglass_power")
needs_ref = pytest.mark.skipif(not os.path.isdir(CHIMERA128),
                               reason="reference chimera128 not present")


@needs_ref
def test_tree_refine_state_recovers_shipped_truth():
    from nmc_tpu.evaluation import chimera_folder_instances
    name, prob, gs = next(iter(chimera_folder_instances(CHIMERA128)))
    rng = np.random.default_rng(0)
    s0 = rng.choice([-1.0, 1.0], size=prob.n)
    e, state, info = tree_refine_state(prob, s0, target_raw=gs,
                                       ils_seconds=5.0, seed=0)
    assert state.shape == (prob.n,)
    # f64 re-evaluation of the returned state matches the reported energy
    assert abs(float(prob.energy(state)) - e) < 1e-9
    assert info["hit"] is True and e <= gs + 1e-6
    assert info["e_int"] <= info["e_int_start"]


@needs_ref
def test_tree_refine_state_without_target_is_monotone():
    from nmc_tpu.evaluation import chimera_folder_instances
    name, prob, gs = next(iter(chimera_folder_instances(CHIMERA128)))
    rng = np.random.default_rng(1)
    s0 = rng.choice([-1.0, 1.0], size=prob.n)
    e, state, info = tree_refine_state(prob, s0)
    assert info["hit"] is None
    assert e <= float(prob.energy(s0)) + 1e-9


def test_tree_refine_state_rejects_non_grid():
    rng = np.random.default_rng(2)
    J = rng.normal(size=(24, 24))
    J = (J + J.T) / 2
    np.fill_diagonal(J, 0)
    prob = IsingProblem(J, np.zeros(24))
    with pytest.raises(ValueError):
        tree_refine_state(prob, np.ones(24))


def test_portfolio_tree_stage_auto_skips_non_grid():
    """tree='auto' must probe the layout and silently skip dense
    instances instead of raising."""
    from nmc_tpu.portfolio import portfolio_solve
    rng = np.random.default_rng(3)
    J = rng.normal(size=(16, 16))
    J = (J + J.T) / 2
    np.fill_diagonal(J, 0)
    prob = IsingProblem(J, np.zeros(16))
    res = portfolio_solve(prob, None, sweeps=0, spectral=True,
                          presolve=False, tree="auto")
    assert "tree" not in [s.stage for s in res.stages]
    assert res.state.shape == (16,)


@needs_ref
def test_portfolio_tree_stage_runs_on_chimera():
    from nmc_tpu.evaluation import chimera_folder_instances
    from nmc_tpu.portfolio import portfolio_solve
    name, prob, gs = next(iter(chimera_folder_instances(CHIMERA128)))
    # no spectral, no MCMC: the tree stage alone descends from all-up
    res = portfolio_solve(prob, gs, name=name, sweeps=0, spectral=False,
                          presolve=False, tree="auto", tree_ils=5.0)
    stages = [s.stage for s in res.stages]
    assert "tree" in stages
    assert res.energy_raw <= 0.0  # descended well below the all-up state


def test_partition_crossover_is_optimal_recombination():
    """Offspring must equal the best of all 2^k per-component parent
    choices (brute-forced here), and never exceed either parent."""
    from itertools import product

    from nmc_tpu.refine import partition_crossover

    rng = np.random.default_rng(7)
    # sparse ring-of-cliques so disagreement splits into components
    n = 24
    J = np.zeros((n, n))
    for b in range(0, n, 4):
        blk = rng.normal(size=(4, 4))
        J[b:b + 4, b:b + 4] = (blk + blk.T) / 2
        J[b + 3, (b + 4) % n] = J[(b + 4) % n, b + 3] = rng.normal()
    np.fill_diagonal(J, 0)
    prob = IsingProblem(J, rng.normal(size=n) * 0.1)

    for trial in range(5):
        s_a = rng.choice([-1.0, 1.0], size=n)
        s_b = rng.choice([-1.0, 1.0], size=n)
        e_off, off, taken = partition_crossover(prob, s_a, s_b)
        assert abs(float(prob.energy(off)) - e_off) < 1e-9
        assert e_off <= float(prob.energy(s_a)) + 1e-9
        assert e_off <= float(prob.energy(s_b)) + 1e-9
        # brute force every per-component recombination
        d = s_a != s_b
        idx = np.flatnonzero(d)
        if idx.size == 0:
            continue
        # component labels via simple BFS on the induced subgraph
        labels = -np.ones(n, int)
        lab = 0
        for i in idx:
            if labels[i] >= 0:
                continue
            stack = [i]
            labels[i] = lab
            while stack:
                u = stack.pop()
                for v in np.flatnonzero(J[u]):
                    if d[v] and labels[v] < 0:
                        labels[v] = lab
                        stack.append(v)
            lab += 1
        best = np.inf
        comps = [idx[labels[idx] == k] for k in range(lab)]
        for choice in product([0, 1], repeat=lab):
            s = s_a.copy()
            for k, c in enumerate(choice):
                if c:
                    s[comps[k]] = s_b[comps[k]]
            best = min(best, float(prob.energy(s)))
        assert abs(e_off - best) < 1e-9


def test_partition_crossover_identical_parents():
    from nmc_tpu.refine import partition_crossover
    rng = np.random.default_rng(8)
    J = np.zeros((8, 8))
    J[0, 1] = J[1, 0] = 1.0
    prob = IsingProblem(J, np.zeros(8))
    s = rng.choice([-1.0, 1.0], size=8)
    e, off, taken = partition_crossover(prob, s, s)
    assert taken == 0 and np.array_equal(off, s)


@needs_ref
def test_cli_refine_single_instance(tmp_path):
    from nmc_tpu.cli import main as cli_main
    inst = os.path.join(CHIMERA128, "001.txt")
    state = tmp_path / "s0.txt"
    rng = np.random.default_rng(4)
    np.savetxt(state, rng.choice([-1, 1], size=128), fmt="%d")
    out = tmp_path / "refine.jsonl"
    rc = cli_main(["refine", inst, "--state", str(state),
                   "--ils-seconds", "5", "--out", str(out),
                   "--save-state", str(tmp_path / "best.txt")])
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1
    rec = rows[0]
    assert rec["e_int"] <= rec["e_int_start"]
    best = np.loadtxt(tmp_path / "best.txt")
    assert best.shape == (128,) and set(np.unique(best)) <= {-1.0, 1.0}
    if rec["hit"]:
        assert rc == 0
