"""Spectral ground-state search (ops/spectral.py).

Background: the Wishart-planted folders the reference ships as its hard
examples (/root/reference/NMC/examples/contrived_wishart_backbone/
wishart_planting_N_50_alpha_0.20) have golf-course landscapes — every
MCMC arm (PT/NMC/ICM, 32 replicas, 400k sweeps) stalls at the same
1-flip-stable sea ~1.5 % above the planted state, which sign-rounded
eigenvectors of J + greedy descent recover in milliseconds (47/50
instances; 48/50 with the 2-flip polish).
"""
import os

import numpy as np
import pytest

from nmc_tpu.io.generators import wishart_planted
from nmc_tpu.core.problem import IsingProblem
from nmc_tpu.ops.spectral import (
    batched_descent_host,
    greedy_descent,
    spectral_candidates,
    spectral_search,
    two_flip_descent,
)

REF_WISHART = ("/root/reference/NMC/examples/contrived_wishart_backbone/"
               "wishart_planting_N_50_alpha_0.20")


def test_greedy_descent_reaches_one_flip_stability():
    rng = np.random.default_rng(0)
    n = 32
    J = rng.normal(size=(n, n))
    J = (J + J.T) / 2
    np.fill_diagonal(J, 0.0)
    h = rng.normal(size=n)
    s, f = greedy_descent(J, rng.choice([-1.0, 1.0], n), h)
    assert np.allclose(f, J @ s + h)
    assert np.all(2.0 * s * f >= -1e-9)     # no improving single flip


def test_batched_descent_matches_sequential():
    rng = np.random.default_rng(1)
    n, C = 24, 7
    J = rng.normal(size=(n, n))
    J = (J + J.T) / 2
    np.fill_diagonal(J, 0.0)
    S0 = rng.choice([-1.0, 1.0], (C, n))
    S = batched_descent_host(J, S0)
    for c in range(C):
        s_ref, _ = greedy_descent(J, S0[c])
        assert np.array_equal(S[c], s_ref)


def test_two_flip_descent_is_two_flip_stable():
    rng = np.random.default_rng(2)
    n = 20
    J = rng.normal(size=(n, n))
    J = (J + J.T) / 2
    np.fill_diagonal(J, 0.0)
    s, f = two_flip_descent(J, rng.choice([-1.0, 1.0], n))
    d1 = 2.0 * s * f
    M = d1[:, None] + d1[None, :] - 4.0 * J * np.outer(s, s)
    np.fill_diagonal(M, np.inf)
    assert d1.min() >= -1e-9 and M.min() >= -1e-9


def test_spectral_candidates_invariants_on_generated_wishart():
    # NOTE: our redesigned wishart_planted spreads the planted state
    # across the near-degenerate top eigenspace (no single aligned
    # eigenvector), unlike the SHIPPED reference instances where the
    # planted state is ~0.97-aligned with one eigenvector — the shipped
    # families are the spectral-search target (test below).  Here we
    # check the search machinery's invariants: descent never ascends,
    # the ground state is a fixed point, candidates are sorted/stable.
    prob, t, gs = wishart_planted(24, 0.25, seed=3)
    res = spectral_search(IsingProblem(prob.J, prob.h, name="w"))
    assert np.all(np.diff(res.energies) >= -1e-12)      # sorted
    f = res.best_state @ prob.J
    assert np.all(2.0 * res.best_state * f >= -1e-9)    # 1-flip stable
    # the planted ground state is a descent fixed point
    s_fix, _ = greedy_descent(prob.J, t)
    assert np.array_equal(s_fix, t)
    # and a two-flip-polished candidate never exceeds its input energy
    s2, _ = two_flip_descent(prob.J, res.best_state)
    assert float(-0.5 * s2 @ prob.J @ s2) <= res.best_energy + 1e-9


@pytest.mark.skipif(not os.path.isdir(REF_WISHART),
                    reason="reference instances not available")
def test_spectral_solves_shipped_wishart_n50():
    from nmc_tpu.io.loaders import load_wishart
    gs = {}
    with open(os.path.join(REF_WISHART, "gs_energies.txt")) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                gs[parts[0]] = float(parts[1])
    hits = 0
    names = sorted(gs)[:10]
    for name in names:
        prob = load_wishart(os.path.join(REF_WISHART, name))
        res = spectral_search(prob)
        hits += abs(res.best_energy - gs[name]) < 1e-6
    # MCMC arms hit 0 of these at 400k sweeps; spectral gets >= 9/10
    assert hits >= 9


def test_spectral_candidates_device_matches_host():
    import jax
    import jax.numpy as jnp
    from nmc_tpu.ops.spectral import spectral_candidates_device
    prob, t, gs = wishart_planted(16, 0.25, seed=4)
    S, E = spectral_candidates_device(jnp.asarray(prob.J),
                                      dtype=jnp.float32)
    # device candidates are 1-flip stable and the best matches the host
    host_states, host_E = spectral_candidates(prob.J)
    assert float(E[0]) <= host_E[0] + 1e-3
    f = np.asarray(S) @ prob.J
    assert np.all(2.0 * np.asarray(S) * f >= -1e-3)


def test_ensemble_seeding_places_candidates_coldest():
    from nmc_tpu.parallel.ensemble import EnsemblePT, EnsembleConfig
    import jax
    prob, t, gs = wishart_planted(16, 0.25, seed=5)
    p = IsingProblem(prob.J, prob.h, name="w")
    beta = np.geomspace(0.3, 3.0, 8)
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ("instance",))
    ens = EnsemblePT([p, p], beta, EnsembleConfig(sweeps_per_round=4),
                     mesh=mesh)
    states, energies = spectral_candidates(p.J)
    m0 = np.stack([states[:3], states[:3]])
    st = ens.init_state(jax.random.PRNGKey(0), m0=m0)
    m = np.asarray(st.m)[:, :, np.asarray(ens.blocked0.inv_perm)]
    # best candidate sits in the coldest slot (R-1), next in R-2, ...
    for i in range(2):
        for c in range(3):
            assert np.array_equal(m[i, 7 - c], states[c])
    # un-seeded chains match the purely random init at the same key
    st_r = ens.init_state(jax.random.PRNGKey(0))
    m_r = np.asarray(st_r.m)
    assert np.array_equal(np.asarray(st.m)[:, :5], m_r[:, :5])


def test_ensemble_icm_seeding_subreplica0_only():
    from nmc_tpu.parallel.ensemble_icm import (EnsembleICM,
                                               EnsembleICMConfig)
    import jax
    prob, t, gs = wishart_planted(16, 0.25, seed=6)
    p = IsingProblem(prob.J, prob.h, name="w")
    beta = np.geomspace(0.3, 3.0, 8)
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:1]), ("instance",))
    ens = EnsembleICM([p], beta, EnsembleICMConfig(
        sweeps_per_round=4, num_subreplicas=2), mesh=mesh)
    states, _ = spectral_candidates(p.J)
    st = ens.init_state(jax.random.PRNGKey(0), m0=states[None, :2])
    m = np.asarray(st.m)[:, :, :, np.asarray(ens.blocked0.inv_perm)]
    assert np.array_equal(m[0, 0, 7], states[0])
    assert np.array_equal(m[0, 0, 6], states[1])
    st_r = ens.init_state(jax.random.PRNGKey(0))
    # subreplica 1 untouched
    assert np.array_equal(np.asarray(st.m)[:, 1], np.asarray(st_r.m)[:, 1])


# ----------------------------------------------------------------------
# Difference-map rounding (degenerate-eigenspace / float-coupling folders)
# ----------------------------------------------------------------------

N25_FOLDER = ("/root/reference/NPT/examples/wishart_small/"
              "wishart_planting_N_25_alpha_0.20")


@pytest.mark.skipif(not os.path.isdir(N25_FOLDER),
                    reason="reference wishart_small not present")
def test_difference_map_cracks_float_coupling_folder():
    """The N=25 float-coupling folders have a DEGENERATE top eigenspace —
    plain eigenvector rounding scores 0/50 on alpha=0.20 (measured) and
    400k-sweep PT/NMC/ICM all stall.  Pooled difference-map snapshots in
    the top-(n-M) eigenspace + descent recover the planted state."""
    from nmc_tpu.io.loaders import load_wishart, read_gs_energies
    gs = read_gs_energies(os.path.join(N25_FOLDER, "gs_energies.txt"))
    for inst in ("inst_1", "inst_10"):
        name = f"wishart_planting_N_25_alpha_0.20_{inst}.txt"
        prob = load_wishart(os.path.join(N25_FOLDER, name))
        g = gs.get(name, gs.get(name.replace(".txt", "")))
        # plain rounding misses
        r0 = spectral_search(prob)
        assert r0.best_energy > g + 1e-6 * abs(g)
        # difference-map pool hits (d = n - round(0.2 n) = 20)
        r1 = spectral_search(prob, dm_starts=512, dm_dim=20)
        assert r1.best_energy <= g + 1e-6 * abs(g) + 1e-9


def test_auto_subspace_dim_gap_heuristic():
    from nmc_tpu.ops.spectral import auto_subspace_dim
    # synthetic spectrum: 5 strongly-negative, 20 near-degenerate top
    w = np.concatenate([np.array([-2.0, -1.5, -1.2, -0.9, -0.6]),
                        np.linspace(0.2, 0.5, 20)])
    assert auto_subspace_dim(np.sort(w)) == 20


def test_difference_map_device_matches_host_semantics():
    """Device DM pool + device descent finds the same planted optimum the
    host pool finds on a generated integer-quantized instance."""
    import jax.numpy as jnp
    from nmc_tpu.ops.spectral import (batched_descent_device,
                                      difference_map_rounding,
                                      difference_map_rounding_device)
    prob, t, gs_e = wishart_planted(n=24, alpha=0.5, seed=3)
    J = np.asarray(prob.J, np.float64)
    _, v = np.linalg.eigh(J)
    V = v[:, 12:]
    Sh = difference_map_rounding(V, num_starts=256, iters=400, seed=0)
    Sh = batched_descent_host(J, Sh)
    eh = (-0.5 * np.einsum("cn,cn->c", Sh, Sh @ J)).min()
    Sd = difference_map_rounding_device(jnp.asarray(V, jnp.float32),
                                        num_starts=256, iters=400)
    Sd = batched_descent_device(jnp.asarray(J, jnp.float32), Sd)
    Sd = np.asarray(Sd, np.float64)
    ed = (-0.5 * np.einsum("cn,cn->c", Sd, Sd @ J)).min()
    assert eh <= gs_e + 1e-9
    assert ed <= gs_e + 1e-6 * abs(gs_e)
