"""Sparse (edge-list) Loopy Belief Propagation for large-N topologies.

The dense LBP (ops/lbp.py) carries [N, N] message matrices — at the
reference's larger instances (chimera2048, DCL C16) that is fine, but at
N >> 10^4 dense messages blow HBM (SURVEY.md hard parts). This variant
stores one message per DIRECTED edge and updates them with segment-sum
reductions:

    S[i]        = h[i] + sum_{e: dst(e)=i} u[e]
    h_msg[e=i->j] = S[i] - u[rev(e)]
    u_new[e]    = atanh_sat( tanh(beta*J_e) * tanh(beta*h_msg[e]) ) / beta
    mag[i]      = tanh( beta * (h[i] + S[i]) )

which is algebraically identical to the dense recursion at
/root/reference/NMC/nmc.py:195-216 restricted to the nonzero couplings
(verified against the dense implementation in tests/test_lbp_sparse.py).
Cost per iteration: O(nnz) elementwise + two segment sums — all VPU work,
jit/scan friendly, and shardable over the edge axis if nnz outgrows a chip.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .lbp import atanh_saturated, lambda_ladder


@dataclasses.dataclass(frozen=True)
class EdgeGraph:
    """Directed edge-list view of a symmetric J (host-built, device arrays)."""

    src: jnp.ndarray      # [E] int32 source node per directed edge
    dst: jnp.ndarray      # [E] int32 destination node
    weight: jnp.ndarray   # [E] J[src, dst]
    rev: jnp.ndarray      # [E] index of the reversed edge
    n: int

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])

    @staticmethod
    def from_dense(J: np.ndarray) -> "EdgeGraph":
        J = np.asarray(J.toarray() if hasattr(J, "toarray") else J)
        iu, ju = np.nonzero(np.triu(J, 1))
        w = J[iu, ju]
        E2 = len(iu)
        src = np.concatenate([iu, ju]).astype(np.int32)
        dst = np.concatenate([ju, iu]).astype(np.int32)
        weight = np.concatenate([w, w])
        rev = np.concatenate([np.arange(E2) + E2,
                              np.arange(E2)]).astype(np.int32)
        return EdgeGraph(src=jnp.asarray(src), dst=jnp.asarray(dst),
                         weight=jnp.asarray(weight), rev=jnp.asarray(rev),
                         n=J.shape[0])


class SparseLBPResult(NamedTuple):
    magnetizations: jax.Array  # [N]
    h_tilde: jax.Array         # [N]
    u_msgs: jax.Array          # [E]
    iterations: jax.Array
    converged: jax.Array
    belief: jax.Array = None   # [N] pre-tanh total field h + sum u
    #   (magnetizations = tanh(beta * belief); f32-safe thresholding)


@functools.partial(jax.jit, static_argnames=("max_iterations", "num_nodes"))
def sparse_lbp(
    src, dst, weight, rev,
    h, beta, u0, tolerance,
    *,
    max_iterations: int,
    num_nodes: int,
):
    """Edge-message LBP; u0 [E] warm-start messages."""
    beta = jnp.asarray(beta, h.dtype)
    # dtype-aware tolerance floor (see ops/lbp.loopy_belief_propagation)
    eps = jnp.finfo(h.dtype).eps
    floor = eps if h.dtype == jnp.float64 else 4 * eps
    tol = jnp.maximum(jnp.asarray(tolerance, h.dtype), floor)
    tanh_bw = jnp.tanh(beta * weight)

    def step(state):
        u, it, _ = state
        S = h + jax.ops.segment_sum(u, dst, num_segments=num_nodes)
        h_msg = S[src] - u[rev]
        u_new = atanh_saturated(tanh_bw * jnp.tanh(beta * h_msg)) / beta
        change = jnp.max(jnp.abs(u_new - u)) / (
            jnp.max(jnp.abs(u_new) + jnp.abs(u)) + 1e-30)
        return u_new, it + 1, change < tol

    def cond(state):
        _, it, conv = state
        return (it < max_iterations) & (~conv)

    u, it, conv = jax.lax.while_loop(
        cond, step, (u0, jnp.int32(0), jnp.bool_(False)))
    S = h + jax.ops.segment_sum(u, dst, num_segments=num_nodes)
    mag = jnp.tanh(beta * S)
    h_tilde = atanh_saturated(mag) / beta
    return SparseLBPResult(magnetizations=mag, h_tilde=h_tilde, u_msgs=u,
                           iterations=it, converged=conv, belief=S)


def sparse_lbp_convexified(
    graph: EdgeGraph,
    h, global_beta,
    m_star, epsilon,
    *,
    lambda_start: float,
    lambda_end: float,
    lambda_reduction_factor: float,
    tolerance: float,
    max_iterations: int,
    return_belief: bool = False,
):
    """Lambda-annealed convexified LBP over edge messages.

    Same ladder/divergence policy as ops/lbp.lbp_convexified; warm start
    u0[e=i->j] = J_ij * m_star[j] mirrors the dense u_msgs = J * m_star
    row-broadcast (/root/reference/NMC/nmc.py:129: u[i, j] picks up
    m_star[j], the DESTINATION node).
    """
    h = jnp.asarray(h).reshape(-1)
    m_star = jnp.asarray(m_star, h.dtype).reshape(-1)
    epsilon = jnp.asarray(epsilon, h.dtype).reshape(-1)
    u = graph.weight * m_star[graph.dst]

    ladder = lambda_ladder(lambda_start, lambda_end, lambda_reduction_factor)
    marginal_prev = None
    marginal = None
    belief_prev = None
    belief = None
    for i, lam in enumerate(ladder):
        h_lambda = h + lam * m_star * epsilon
        res = sparse_lbp(graph.src, graph.dst, graph.weight, graph.rev,
                         h_lambda, global_beta, u, tolerance,
                         max_iterations=max_iterations, num_nodes=graph.n)
        u = res.u_msgs
        diverged = not bool(res.converged)
        if diverged and i == 0:
            raise ValueError(
                "LBP diverged at initial lambda, please try a larger "
                "lambda_start or increase max_iterations or beta")
        if diverged:
            marginal = marginal_prev
            belief = belief_prev
            break
        marginal = np.asarray(res.magnetizations)
        marginal_prev = marginal
        belief = np.asarray(res.belief)
        belief_prev = belief
    if return_belief:
        return np.asarray(marginal), np.asarray(belief)
    return np.asarray(marginal)
