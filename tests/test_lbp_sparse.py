"""Sparse edge-list LBP agrees with the dense implementation."""

import jax.numpy as jnp
import numpy as np

from nmc_tpu.ops.lbp import (convexification_epsilon, lbp_convexified,
                             loopy_belief_propagation)
from nmc_tpu.ops.lbp_sparse import (EdgeGraph, sparse_lbp,
                                    sparse_lbp_convexified)


def sparse_instance(rng, n=30, degree=3):
    J = np.zeros((n, n))
    for i in range(n):
        nbrs = rng.choice(n, size=degree, replace=False)
        for j in nbrs:
            if i != j and J[i, j] == 0:
                w = rng.normal() * 0.4
                J[i, j] = J[j, i] = w
    h = rng.normal(size=n) * 0.3
    return J, h


def test_edge_graph_construction(rng):
    J, _ = sparse_instance(rng)
    g = EdgeGraph.from_dense(J)
    src, dst, w, rev = (np.asarray(g.src), np.asarray(g.dst),
                        np.asarray(g.weight), np.asarray(g.rev))
    assert g.num_edges == np.count_nonzero(J)
    np.testing.assert_allclose(w, J[src, dst])
    # reverse map really reverses
    np.testing.assert_array_equal(src[rev], dst)
    np.testing.assert_array_equal(dst[rev], src)


def test_sparse_matches_dense_lbp(rng):
    J, h = sparse_instance(rng)
    n = J.shape[0]
    beta = 0.8
    dense = loopy_belief_propagation(
        jnp.asarray(J), jnp.asarray(h), beta,
        jnp.zeros((n, n)), jnp.zeros((n, n)), 1e-10, max_iterations=300)
    g = EdgeGraph.from_dense(J)
    sparse = sparse_lbp(g.src, g.dst, g.weight, g.rev, jnp.asarray(h), beta,
                        jnp.zeros(g.num_edges), 1e-10,
                        max_iterations=300, num_nodes=n)
    np.testing.assert_allclose(np.asarray(sparse.magnetizations),
                               np.asarray(dense.magnetizations), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sparse.h_tilde),
                               np.asarray(dense.h_tilde), atol=1e-6)


def test_sparse_convexified_matches_dense(rng):
    J, h = sparse_instance(rng)
    beta = 2.0
    eps = convexification_epsilon(J, h)
    m_star = np.sign(rng.normal(size=J.shape[0]))
    dense = lbp_convexified(
        jnp.asarray(J), jnp.asarray(h), beta, m_star, eps,
        lambda_start=2.0, lambda_end=0.01, lambda_reduction_factor=0.7,
        tolerance=1e-9, max_iterations=300)
    g = EdgeGraph.from_dense(J)
    sparse_marg = sparse_lbp_convexified(
        g, h, beta, m_star, eps,
        lambda_start=2.0, lambda_end=0.01, lambda_reduction_factor=0.7,
        tolerance=1e-9, max_iterations=300)
    np.testing.assert_allclose(sparse_marg, dense.marginal, atol=1e-6)
