"""Native C++ cluster kernels: build, parity with Python/scipy paths."""

import numpy as np
import pytest

from nmc_tpu import native
from nmc_tpu.ops.clusters import (disagreement_clusters,
                                  disagreement_clusters_adj, find_clusters)

from conftest import random_sk

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def sparse_J(rng, n=40, degree=3):
    J = np.zeros((n, n))
    for i in range(n):
        for j in rng.choice(n, size=degree, replace=False):
            if i != j:
                w = rng.normal()
                J[i, j] = J[j, i] = w
    return J


def test_connected_components_parity(rng):
    J = sparse_J(rng)
    adj = native.CSRAdjacency(J)
    for _ in range(10):
        s1 = np.sign(rng.normal(size=40))
        s2 = np.sign(rng.normal(size=40))
        a = sorted(tuple(sorted(c.tolist())) for c in
                   disagreement_clusters_adj(adj, s1, s2))
        b = sorted(tuple(sorted(c.tolist())) for c in
                   disagreement_clusters(J, s1, s2))
        assert a == b


def test_connected_components_dense_parity(rng):
    J, _ = random_sk(rng, 20)
    adj = native.CSRAdjacency(J)
    s1 = np.sign(rng.normal(size=20))
    s2 = -s1  # everything disagrees -> one dense component
    comps = disagreement_clusters_adj(adj, s1, s2)
    assert len(comps) == 1 and comps[0].size == 20


def test_backbone_clusters_parity(rng):
    J = sparse_J(rng, n=30)
    adj = native.CSRAdjacency(J)
    for trial in range(5):
        mag = np.tanh(2.5 * rng.normal(size=30))
        ours = native.backbone_clusters(adj, mag, 0.6, 0.3, 0.01)
        ref = find_clusters(J, mag, 0.6, 0.3, 0.01)
        assert sorted(tuple(sorted(c.tolist())) for c in ours) == \
               sorted(tuple(sorted(c.tolist())) for c in ref)


def test_empty_active_set(rng):
    J = sparse_J(rng, n=10)
    adj = native.CSRAdjacency(J)
    s = np.ones(10)
    assert disagreement_clusters_adj(adj, s, s) == []
