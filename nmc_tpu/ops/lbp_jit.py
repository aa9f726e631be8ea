"""In-jit convexified LBP marginal bodies shared by the sharded engines.

One implementation of the λ-ladder convexified Loopy Belief Propagation
marginal (reference: LBP_convexified + LoopyBeliefPropagation,
/root/reference/NMC/nmc.py:93-228, duplicated at /root/reference/NPT/
npt.py:129-264), consumed by both parallel/sharded_pt.py (per-slot, vmapped
over local replicas) and parallel/ensemble_nmc.py (per-chain, vmapped over
slots x instances). Both a dense [N, N] message variant and an O(nnz)
edge-message variant are provided; each returns belief LOGITS
beta*(h + Σu) rather than tanh of them — f32 tanh saturates to 1.0 above
~8.3 and destroys the reference's f64 threshold discrimination
(ops/clusters.backbone_mask_device logits=True maps thresholds through
atanh instead).

The reference's divergence policy is preserved per λ rung with a where()
instead of early exit: a non-converged rung keeps the previous rung's
marginal (npt.py:181-183).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .lbp import atanh_saturated


def convexified_marginal_dense(J_full, h, epsilon, m_star, *, beta, ladder,
                               max_iterations, tolerance):
    """Convexified LBP belief logits for ONE chain, dense messages.

    J_full: [n, n] couplings (blocked layout), h/epsilon/m_star: [n].
    Returns [n] belief logits beta*(h_λ + Σ_k u_k->i) at the last
    converged λ rung.
    """
    n = J_full.shape[0]
    beta = jnp.asarray(beta, J_full.dtype)
    tanh_bJ = jnp.tanh(beta * J_full)
    eye = jnp.eye(n, dtype=J_full.dtype)

    def lbp(h_lambda, h_msgs, u_msgs):
        def step(state):
            h_m, u_m, it, _ = state
            col_in = h_lambda + jnp.sum(u_m, axis=0)
            h_new = (col_in[:, None] - u_m.T) * (1.0 - eye)
            u_new = jnp.arctanh(jnp.clip(
                tanh_bJ * jnp.tanh(beta * h_new),
                -0.9999999, 0.9999999)) / beta
            u_ch = jnp.max(jnp.abs(u_new - u_m)) / (
                jnp.max(jnp.abs(u_new) + jnp.abs(u_m)) + 1e-30)
            h_ch = jnp.max(jnp.abs(h_new - h_m)) / (
                jnp.max(jnp.abs(h_new) + jnp.abs(h_m)) + 1e-30)
            conv = (u_ch < tolerance) & (h_ch < tolerance)
            return h_new, u_new, it + 1, conv

        def cond(state):
            _, _, it, conv = state
            return (it < max_iterations) & (~conv)

        h_f, u_f, _, conv = lax.while_loop(
            cond, step, (h_msgs, u_msgs, jnp.int32(0), jnp.bool_(False)))
        logit = beta * (h_lambda + jnp.sum(u_f, axis=0))
        return logit, h_f, u_f, conv

    h_msgs = jnp.zeros_like(J_full)
    u_msgs = J_full * m_star[None, :]
    marginal = jnp.zeros(n, J_full.dtype)
    have_prev = jnp.bool_(False)
    for lam in ladder:
        h_lambda = h + lam * m_star * epsilon
        mag, h_msgs, u_msgs, conv = lbp(h_lambda, h_msgs, u_msgs)
        marginal = jnp.where(conv | ~have_prev, mag, marginal)
        have_prev = have_prev | conv
    return marginal


def convexified_marginal_sparse(graph, w_e, h, epsilon, m_star, *, beta,
                                ladder, max_iterations, tolerance):
    """Convexified LBP belief logits for ONE chain, edge messages (O(nnz)
    per iteration — the large-N path where dense [N, N] messages per
    vmapped chain would blow memory).

    graph: lbp_sparse.EdgeGraph (src/dst/rev over the instance or family
    union topology); w_e: [E] per-edge couplings (absent union edges carry
    0 -> tanh(beta*0)=0 messages, a no-op). h/epsilon/m_star: [n].
    """
    n = h.shape[0]
    beta = jnp.asarray(beta, h.dtype)
    tanh_bw = jnp.tanh(beta * w_e.astype(h.dtype))

    def lbp(h_lambda, u0):
        def step(state):
            u, it, _ = state
            S = h_lambda + jax.ops.segment_sum(
                u, graph.dst, num_segments=n)
            h_msg = S[graph.src] - u[graph.rev]
            u_new = atanh_saturated(tanh_bw * jnp.tanh(beta * h_msg)) / beta
            ch = jnp.max(jnp.abs(u_new - u)) / (
                jnp.max(jnp.abs(u_new) + jnp.abs(u)) + 1e-30)
            return u_new, it + 1, ch < tolerance

        def cond(state):
            _, it, conv = state
            return (it < max_iterations) & (~conv)

        u, _, conv = lax.while_loop(
            cond, step, (u0, jnp.int32(0), jnp.bool_(False)))
        S = h_lambda + jax.ops.segment_sum(u, graph.dst, num_segments=n)
        return beta * S, u, conv

    u = w_e.astype(h.dtype) * m_star[graph.dst]
    marginal = jnp.zeros(n, h.dtype)
    have_prev = jnp.bool_(False)
    for lam in ladder:
        h_lambda = h + lam * m_star * epsilon
        mag, u, conv = lbp(h_lambda, u)
        marginal = jnp.where(conv | ~have_prev, mag, marginal)
        have_prev = have_prev | conv
    return marginal
