"""Pallas colored-sweep kernel (interpret mode on CPU; real runs happen on
TPU via bench.py and were validated against enumerated Boltzmann there)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmc_tpu.core.problem import IsingProblem, block_problem
from nmc_tpu.io.generators import ea_2d
from nmc_tpu.ops.coloring import color_groups
from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps


def _setup(prob, R, block_size, seed=0):
    groups = color_groups(prob.J)
    b = block_problem(prob, block_size=block_size, groups=groups)
    assert b.colored
    J = jnp.asarray(b.J_rows.reshape(b.n_pad, b.n_pad))
    h = jnp.asarray(b.h)
    rng = np.random.default_rng(seed)
    m0 = np.where(rng.random((R, b.n_pad)) < 0.5, -1.0, 1.0).astype(np.float32)
    m0[:, ~b.active] = 1.0
    phi0 = (m0 @ np.asarray(J) + np.asarray(h)).astype(np.float32)
    mask = np.broadcast_to(b.active, (R, b.n_pad))
    return b, J, h, m0, phi0, mask


def test_kernel_invariants_interpret(rng):
    prob = ea_2d(4, seed=1)  # 16 spins, 2 colors
    b, J, h, m0, phi0, mask = _setup(prob, R=4, block_size=8)
    res = pallas_colored_sweeps(
        J, h, m0, phi0, 7, np.full(6, 1.0, np.float32),
        np.ones_like(m0), mask, num_sweeps=6, block_size=8, interpret=True)
    m = np.asarray(res.m)
    assert set(np.unique(m)) <= {-1.0, 1.0}
    assert np.all(m[:, ~b.active] == 1.0)
    phi_direct = m @ np.asarray(J) + np.asarray(h)
    np.testing.assert_allclose(np.asarray(res.phi), phi_direct, atol=1e-4)
    e_direct = -0.5 * np.sum(m * (phi_direct + np.asarray(h)), axis=1)
    np.testing.assert_allclose(np.asarray(res.energies[-1]), e_direct,
                               atol=1e-3)
    assert np.all(np.asarray(res.e_best)
                  <= np.asarray(res.energies).min(0) + 1e-4)


def test_kernel_respects_update_mask_interpret(rng):
    prob = ea_2d(4, seed=2)
    b, J, h, m0, phi0, _ = _setup(prob, R=3, block_size=8)
    frozen = np.zeros(b.n_pad, bool)
    frozen[:8] = True  # freeze the first color block
    mask = np.broadcast_to(b.active & ~frozen, (3, b.n_pad))
    res = pallas_colored_sweeps(
        J, h, m0, phi0, 9, np.full(5, 2.0, np.float32),
        np.ones_like(m0), mask, num_sweeps=5, block_size=8, interpret=True)
    m = np.asarray(res.m)
    assert np.array_equal(m[:, :8], m0[:, :8])


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="interpret-mode PRNG returns zeros; statistical "
                           "exactness requires real TPU (validated by "
                           "bench.py / manual TPU runs: TV<0.01)")
def test_kernel_boltzmann_tpu(rng):
    # 4-cycle with fields: 2 colors, small enough to enumerate
    n = 4
    J = np.zeros((n, n))
    for i in range(n):
        j = (i + 1) % n
        J[i, j] = J[j, i] = rng.normal()
    prob = IsingProblem(J, 0.3 * rng.normal(size=n))
    beta = 0.8
    states = np.array(list(itertools.product([-1, 1], repeat=n)), float)
    E = prob.energy(states)
    p = np.exp(-beta * E)
    p /= p.sum()
    sidx = (((states + 1) / 2) @ (2 ** np.arange(n)[::-1])).astype(int)

    b, Jd, hd, m0, phi0, mask = _setup(prob, R=96, block_size=8, seed=4)
    counts = np.zeros(16)
    m, phi = m0, phi0
    for it in range(25):
        res = pallas_colored_sweeps(
            Jd, hd, m, phi, 50 + it, np.full(4, beta, np.float32),
            np.ones_like(m0), mask, num_sweeps=4, block_size=8)
        m, phi = np.asarray(res.m), np.asarray(res.phi)
        if it >= 5:
            orig = m[:, b.inv_perm]
            idx = (((orig + 1) / 2) @ (2 ** np.arange(n)[::-1])).astype(int)
            counts += np.bincount(idx, minlength=16)
    counts /= counts.sum()
    target = np.zeros(16)
    target[sidx] = p
    assert np.abs(counts - target).sum() / 2 < 0.05


def test_engine_pallas_backend_gating():
    from nmc_tpu.ops.engine import SweepEngine
    prob = ea_2d(4, seed=3)
    # pallas backend on CPU must refuse (kernel is TPU-only)
    eng = SweepEngine(prob, block_size=8, use_coloring=True,
                      backend="pallas")
    m0 = eng.from_blocked(eng.init_states(jax.random.PRNGKey(0), 2))
    with pytest.raises(ValueError):
        eng.run(m0, jax.random.PRNGKey(1), num_sweeps=2, beta=1.0)
    # auto backend silently uses XLA on CPU
    eng2 = SweepEngine(prob, block_size=8, use_coloring=True)
    res = eng2.run(m0, jax.random.PRNGKey(1), num_sweeps=2, beta=1.0)
    assert np.isfinite(np.asarray(res.e_best)).all()


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="streaming kernel is TPU-only (DMA + PRNG)")
def test_streamed_kernel_invariants_tpu(rng):
    from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_streamed
    prob = ea_2d(16, seed=0)
    b, J, h, m0, phi0, _ = _setup(prob, R=8, block_size=128)
    Jb = jnp.asarray(b.J_rows)
    res = pallas_colored_sweeps_streamed(
        Jb, h, m0, phi0, 42, np.full(10, 1.0, np.float32),
        np.ones(8, np.float32), b.active, num_sweeps=10, block_size=128,
        r_tile=8)
    m = np.asarray(res.m)
    assert set(np.unique(m)) <= {-1.0, 1.0}
    Jf = np.asarray(b.J_rows.reshape(b.n_pad, b.n_pad))
    np.testing.assert_allclose(np.asarray(res.phi),
                               m @ Jf + np.asarray(h), atol=1e-3)


def test_streamed_kernel_interpret(rng):
    """CPU interpret-mode run of the HBM-streamed dense kernel: phi
    bookkeeping (and the aliased-state init copy) must hold without TPU
    hardware."""
    from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_streamed
    prob = ea_2d(16, seed=0)
    b, J, h, m0, phi0, _ = _setup(prob, R=8, block_size=128)
    res = pallas_colored_sweeps_streamed(
        jnp.asarray(b.J_rows), h, m0, phi0, 42, np.full(3, 1.0, np.float32),
        np.ones(8, np.float32), b.active, num_sweeps=3, block_size=128,
        r_tile=8, interpret=True)
    m = np.asarray(res.m)
    assert set(np.unique(m)) <= {-1.0, 1.0}
    Jf = np.asarray(b.J_rows.reshape(b.n_pad, b.n_pad))
    np.testing.assert_allclose(np.asarray(res.phi),
                               m @ Jf + np.asarray(h), atol=1e-3)


def test_sparse_streamed_tile_layout_interpret(rng):
    """CPU interpret-mode run of the sparse streaming kernel. The
    interpret PRNG stub makes the spin draws deterministic, but the phi
    bookkeeping — and therefore the concatenated [B, K*B] tile layout the
    wrapper pre-builds for the wide phi matmul — must stay exact. Pins
    the layout so a wrapper/kernel mismatch fails without TPU hardware."""
    from nmc_tpu.core.problem import block_sparse_tiles
    from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_sparse
    prob = ea_2d(16, seed=0)
    b, J, h, m0, phi0, _ = _setup(prob, R=8, block_size=128)
    col_idx, J_tiles = block_sparse_tiles(b)
    res = pallas_colored_sweeps_sparse(
        col_idx, J_tiles, h, m0, phi0, 42, np.full(3, 1.0, np.float32),
        np.ones(8, np.float32), b.active, num_sweeps=3, block_size=128,
        r_tile=8, interpret=True)
    m = np.asarray(res.m)
    assert set(np.unique(m)) <= {-1.0, 1.0}
    Jf = np.asarray(b.J_rows.reshape(b.n_pad, b.n_pad))
    np.testing.assert_allclose(np.asarray(res.phi),
                               m @ Jf + np.asarray(h), atol=1e-3)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="sparse streaming kernel is TPU-only")
def test_sparse_streamed_kernel_invariants_tpu(rng):
    from nmc_tpu.core.problem import block_sparse_tiles
    from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_sparse
    prob = ea_2d(16, seed=0)
    b, J, h, m0, phi0, _ = _setup(prob, R=8, block_size=128)
    col_idx, J_tiles = block_sparse_tiles(b)
    res = pallas_colored_sweeps_sparse(
        col_idx, J_tiles, h, m0, phi0, 42, np.full(10, 1.0, np.float32),
        np.ones(8, np.float32), b.active, num_sweeps=10, block_size=128,
        r_tile=8)
    m = np.asarray(res.m)
    assert set(np.unique(m)) <= {-1.0, 1.0}
    Jf = np.asarray(b.J_rows.reshape(b.n_pad, b.n_pad))
    np.testing.assert_allclose(np.asarray(res.phi),
                               m @ Jf + np.asarray(h), atol=1e-3)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="sparse streaming kernel is TPU-only")
def test_sparse_streamed_masked_heated_tpu(rng):
    """NMC phase parametrization on the sparse streaming kernel: per-chain
    frozen spins must not move, per-spin heating runs, phi stays exact
    (VERDICT round 1 #2/#3)."""
    from nmc_tpu.core.problem import block_sparse_tiles
    from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_sparse
    prob = ea_2d(16, seed=0)
    b, J, h, m0, phi0, _ = _setup(prob, R=8, block_size=128)
    col_idx, J_tiles = block_sparse_tiles(b)
    mask = (rng.random((8, b.n_pad)) < 0.5) & np.asarray(b.active)
    bs = np.where(mask, 1.0 / 20.0, 1.0).astype(np.float32)  # heated clusters
    res = pallas_colored_sweeps_sparse(
        col_idx, J_tiles, h, m0, phi0, 42, np.full(12, 2.0, np.float32),
        np.ones(8, np.float32), mask.astype(np.float32), bs,
        num_sweeps=12, block_size=128, r_tile=8)
    m = np.asarray(res.m)
    m0h = np.asarray(m0)
    np.testing.assert_array_equal(m[~mask], m0h[~mask])   # frozen spins held
    assert (m[mask] != m0h[mask]).any()                   # heated spins move
    Jf = np.asarray(b.J_rows.reshape(b.n_pad, b.n_pad))
    np.testing.assert_allclose(np.asarray(res.phi), m @ Jf + np.asarray(h),
                               atol=1e-3)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="streaming kernel is TPU-only")
def test_streamed_masked_heated_tpu(rng):
    from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_streamed
    prob = ea_2d(16, seed=0)
    b, J, h, m0, phi0, _ = _setup(prob, R=8, block_size=128)
    mask = (rng.random((8, b.n_pad)) < 0.5) & np.asarray(b.active)
    bs = np.where(mask, 1.0 / 20.0, 1.0).astype(np.float32)
    res = pallas_colored_sweeps_streamed(
        jnp.asarray(b.J_rows), h, m0, phi0, 42, np.full(12, 2.0, np.float32),
        np.ones(8, np.float32), mask.astype(np.float32), bs,
        num_sweeps=12, block_size=128, r_tile=8)
    m = np.asarray(res.m)
    np.testing.assert_array_equal(m[~mask], np.asarray(m0)[~mask])
    Jf = np.asarray(b.J_rows.reshape(b.n_pad, b.n_pad))
    np.testing.assert_allclose(np.asarray(res.phi), m @ Jf + np.asarray(h),
                               atol=1e-3)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="engine streamed routing is TPU-only")
def test_engine_routes_masked_phases_to_streamed_tpu(rng):
    """engine.run with update_mask/beta_spin above n_pad=1536 must take the
    streaming Pallas path (it must NOT raise with backend='pallas')."""
    from nmc_tpu.ops.engine import SweepEngine
    prob = ea_2d(48, seed=1)   # N=2304 > 1536
    eng = SweepEngine(prob, use_coloring=True, backend="pallas")
    m0 = eng.from_blocked(eng.init_states(jax.random.PRNGKey(0), 8))
    mask = rng.random((8, prob.n)) < 0.5
    bs = np.where(mask, 0.05, 1.0)
    res = eng.run(m0, jax.random.PRNGKey(1), num_sweeps=4, beta=2.0,
                  beta_spin=bs, update_mask=mask)
    m = np.asarray(res.m)
    frozen = ~mask
    np.testing.assert_array_equal(m[frozen], np.asarray(m0)[frozen])
