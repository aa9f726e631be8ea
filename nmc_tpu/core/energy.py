"""Batched Ising energies and local fields (device, jittable).

E(m) = -(m^T J m / 2 + m^T h), matching /root/reference/NMC/nmc.py:386 and
/root/reference/NPT/npt.py:43. With cached local fields phi = J@m + h the
energy is O(N): m^T J m = m.(phi - h), so

    E = -0.5 * m.(phi + h)

which is what the sweep engine uses to emit per-sweep energies for free
(the reference recomputes a full [N,N] quadratic form per recorded sweep,
/root/reference/NMC/nmc.py:386-387).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_fields(J: jax.Array, h: jax.Array, m: jax.Array, precision="highest") -> jax.Array:
    """phi = J @ m + h for m of shape [..., N] (J symmetric)."""
    return jnp.matmul(m, J, precision=precision) + h


def energy(J: jax.Array, h: jax.Array, m: jax.Array, precision="highest") -> jax.Array:
    """E(m) for m of shape [..., N] -> [...]."""
    Jm = jnp.matmul(m, J, precision=precision)
    return -(0.5 * jnp.sum(m * Jm, axis=-1) + jnp.sum(m * h, axis=-1))


def energy_from_fields(h: jax.Array, m: jax.Array, phi: jax.Array) -> jax.Array:
    """E(m) from cached local fields phi = J@m + h. O(N) per state."""
    return -0.5 * jnp.sum(m * (phi + h), axis=-1)
