"""Energy / local-field primitives."""

import jax.numpy as jnp
import numpy as np

from nmc_tpu.core.energy import energy, energy_from_fields, local_fields
from nmc_tpu.core.problem import IsingProblem

from conftest import random_sk


def test_energy_matches_definition(rng):
    J, h = random_sk(rng, 23)
    prob = IsingProblem(J, h)
    m = np.sign(rng.normal(size=(5, 23)))
    expected = np.array([-(mm @ J @ mm / 2 + mm @ h) for mm in m])
    np.testing.assert_allclose(prob.energy(m), expected, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(energy(jnp.asarray(J), jnp.asarray(h), jnp.asarray(m))),
        expected, rtol=1e-10)


def test_energy_from_fields(rng):
    J, h = random_sk(rng, 17)
    m = np.sign(rng.normal(size=(4, 17)))
    phi = local_fields(jnp.asarray(J), jnp.asarray(h), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(phi), m @ J + h, rtol=1e-10)
    e = energy_from_fields(jnp.asarray(h), jnp.asarray(m), phi)
    np.testing.assert_allclose(
        np.asarray(e), IsingProblem(J, h).energy(m), rtol=1e-10)


def test_normalization(rng):
    J, h = random_sk(rng, 9)
    prob = IsingProblem(3.7 * J, 3.7 * h)
    norm_prob, factor = prob.normalized()
    assert abs(np.abs(norm_prob.J).max() - 1.0) < 1e-12
    np.testing.assert_allclose(factor, 3.7 * np.abs(J).max(), rtol=1e-12)
    # energies scale by the factor
    m = np.sign(rng.normal(size=9))
    np.testing.assert_allclose(prob.energy(m), factor * norm_prob.energy(m),
                               rtol=1e-12)
