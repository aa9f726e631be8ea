"""Exact leaf-peeling presolve (ops/presolve.py): tree exactness against
brute force, core energy identity, and the contrived-tree reduction the
reference family needs (350 spins -> ~170-spin 2-core)."""
import os

import numpy as np
import pytest

from nmc_tpu.ops.presolve import peel_leaves

TREES = ("/root/reference/NMC/examples/contrived_wishart_backbone/"
         "wishart_contrived_trees/"
         "wishart_planting_N_50_alpha_0.20_contrived_tree")


def _brute(J, h):
    n = J.shape[0]
    best = np.inf
    for b in range(1 << n):
        x = 1.0 - 2.0 * ((b >> np.arange(n)) & 1)
        best = min(best, -0.5 * x @ J @ x - h @ x)
    return best


def test_pure_tree_is_solved_exactly():
    rng = np.random.default_rng(0)
    for trial in range(4):
        n = 12
        J = np.zeros((n, n))
        for i in range(1, n):
            p = rng.integers(0, i)
            J[i, p] = J[p, i] = rng.normal()
        h = rng.normal(size=n)
        ps = peel_leaves(J, h)
        assert ps.core.size == 0
        s = ps.back_substitute(np.zeros(0))
        assert abs(ps.energy(s, J, h) - _brute(J, h)) < 1e-10
        assert abs(ps.constant - _brute(J, h)) < 1e-10


def test_core_energy_identity_and_global_optimum():
    """Folded core energy + constant == full energy of the expansion,
    and min over core states == global minimum (exactness of folding)."""
    rng = np.random.default_rng(1)
    n, k = 16, 6
    J = np.zeros((n, n))
    for t in range(k):                       # cycle core
        i, j = t, (t + 1) % k
        J[i, j] = J[j, i] = rng.normal()
    for i in range(k, n):                    # trees hanging off
        p = rng.integers(0, i)
        J[i, p] = J[p, i] = rng.normal()
    h = rng.normal(size=n)
    ps = peel_leaves(J, h)
    assert set(ps.core) == set(range(k))
    best_full = _brute(J, h)
    best_core = np.inf
    for b in range(1 << k):
        x = 1.0 - 2.0 * ((b >> np.arange(k)) & 1)
        ec = -0.5 * x @ ps.J_core @ x - ps.h_core @ x + ps.constant
        assert abs(ec - ps.energy(ps.back_substitute(x), J, h)) < 1e-10
        best_core = min(best_core, ec)
    assert abs(best_core - best_full) < 1e-10


@pytest.mark.skipif(not os.path.isdir(TREES),
                    reason="reference contrived trees not present")
def test_contrived_tree_reduces_to_half():
    from nmc_tpu.io.loaders import load_contrived_tree
    import glob
    f = sorted(glob.glob(TREES + "/*inst*"))[0]
    p = load_contrived_tree(f)
    ps = peel_leaves(np.asarray(p.J), np.asarray(p.h))
    assert p.n >= 300 and ps.core.size <= 0.6 * p.n
    # expansion of a random core state evaluates consistently
    rng = np.random.default_rng(2)
    sc = rng.choice([-1.0, 1.0], size=ps.core.size)
    ec = (-0.5 * sc @ ps.J_core @ sc - ps.h_core @ sc) + ps.constant
    s = ps.back_substitute(sc)
    assert abs(ec - ps.energy(s, p.J, p.h)) < 1e-8
