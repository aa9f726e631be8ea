"""Micro-profile of Houdayer label-propagation variants on real TPU.

results/icm_phase_breakdown_blocked.json showed the cluster move costs
MORE than a full 96-sweep round at chimera2048 scale (sparse 83.6 ms vs
round 69.6 ms; the blocked tile rewrite did not help, 0.95x). The
per-iteration arithmetic is trivial, so the cost must sit in op overhead
(scatter lowering, data-dependent gathers, while_loop convergence
checks). This script times controlled variants to find out which:

  sparse_j1     current auto path: segment_min + pointer jump, check
                convergence every step
  sparse_j4     same, but 4 propagate+jump steps per convergence check
  blocked_j1    current blocked path: tile gather + masked min + jump
  blocked_oh_j1 blocked, but the [nB,K] block-row gather is a one-hot
                MXU matmul instead of a dynamic gather
  blocked_oh_j4 one-hot gather + 4 steps per check
  *_nojump      pointer jumping removed (costs a data-dependent [n]
                gather per step; pays off only if diameters are small)

All variants are exact fixed points — parity is asserted against the
library's disagreement_labels_sparse before timing.

Run on an idle TPU:  python scripts/profile_houdayer_variants.py
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CHIMERA2048 = ("/root/reference/NMC/examples/Chimera_droplet_instances/"
               "chimera2048_spinglass_power")


def timeit(fn, reps=5):
    import jax
    jax.block_until_ready(fn())
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--folder", default=CHIMERA2048)
    ap.add_argument("--out", default="results/houdayer_variants.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS; jax.config is the only override)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nmc_tpu.core.problem import block_problem
    from nmc_tpu.evaluation import chimera_folder_instances
    from nmc_tpu.ops.clusters import disagreement_labels_sparse
    from nmc_tpu.ops.coloring import color_groups
    from nmc_tpu.parallel.ensemble_nmc import _union_tiles
    from nmc_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()

    name, prob, _ = next(iter(chimera_folder_instances(args.folder, 1)))
    prob = prob.normalized()[0]
    n = prob.n
    J = prob.J
    src, dst = np.nonzero(J)
    src = jnp.asarray(src.astype(np.int32))
    dst = jnp.asarray(dst.astype(np.int32))

    blocked = block_problem(prob, block_size=128, groups=color_groups(J))
    col_idx_np, J_tiles = _union_tiles([blocked])
    col_idx = jnp.asarray(col_idx_np)
    adj_tiles = jnp.asarray(J_tiles[0] != 0)
    nB, K, B, _ = adj_tiles.shape
    n_pad = nB * B
    # one-hot over block-column ids, laid out for a single wide matmul:
    # lab_c[i,k,:] = sum_b onehot[i,k,b] * lab_blocks[b,:]
    onehot = jnp.asarray(
        (col_idx_np[..., None] == np.arange(nB)[None, None, :])
        .astype(np.float32))                      # [nB, K, nB]

    big = jnp.int32(n_pad)
    idx = jnp.arange(n_pad, dtype=jnp.int32)

    def fixpoint(propagate, diff, steps_per_check, jump):
        labels0 = jnp.where(diff, idx, big)

        def one_step(labels):
            nbr = propagate(labels)
            new = jnp.where(diff, jnp.minimum(labels, nbr), big)
            if jump:
                safe = jnp.minimum(new, jnp.int32(n_pad - 1))
                new = jnp.minimum(new, jnp.where(new < big, new[safe], big))
            return new

        def step(state):
            labels, _, it = state
            new = labels
            for _ in range(steps_per_check):
                new = one_step(new)
            return new, jnp.any(new != labels), it + 1

        def cond(state):
            _, changed, it = state
            return changed & (it < n_pad)

        labels, _, iters = jax.lax.while_loop(
            cond, step, (labels0, jnp.bool_(True), jnp.int32(0)))
        return labels, iters * steps_per_check

    def prop_sparse(diff):
        edge_active = diff[src] & diff[dst]

        def propagate(labels):
            cand = jnp.where(edge_active, labels[src], big)
            return jax.ops.segment_min(cand, dst, num_segments=n_pad)
        return propagate

    def prop_blocked(diff):
        diff_b = diff.reshape(nB, B)

        def propagate(labels):
            lab_c = labels.reshape(nB, B)[col_idx]
            dif_c = diff_b[col_idx]
            cand = jnp.where(adj_tiles & dif_c[:, :, None, :],
                             lab_c[:, :, None, :], big)
            return jnp.min(cand, axis=(1, 3)).reshape(n_pad)
        return propagate

    def prop_blocked_onehot(diff):
        diff_b = diff.reshape(nB, B)
        dif_c = jnp.einsum("ikb,bn->ikn", onehot,
                           diff_b.astype(jnp.float32)) > 0.5

        def propagate(labels):
            lab_c = jnp.einsum("ikb,bn->ikn", onehot,
                               labels.reshape(nB, B).astype(jnp.float32))
            lab_c = lab_c.astype(jnp.int32)
            cand = jnp.where(adj_tiles & dif_c[:, :, None, :],
                             lab_c[:, :, None, :], big)
            return jnp.min(cand, axis=(1, 3)).reshape(n_pad)
        return propagate

    VARIANTS = {
        "sparse_j1": (prop_sparse, 1, True),
        "sparse_j4": (prop_sparse, 4, True),
        "blocked_j1": (prop_blocked, 1, True),
        "blocked_j4": (prop_blocked, 4, True),
        "blocked_oh_j1": (prop_blocked_onehot, 1, True),
        "blocked_oh_j4": (prop_blocked_onehot, 4, True),
        "blocked_oh_nojump_c4": (prop_blocked_onehot, 4, False),
    }

    def run_variant(builder, spc, jump, diffs):
        def one(diff):
            return fixpoint(builder(diff), diff, spc, jump)
        return jax.jit(jax.vmap(one))(diffs)

    out = {"backend": jax.default_backend(), "n": int(n),
           "n_pad": int(n_pad), "nB": int(nB), "K": int(K),
           "batch": args.batch, "densities": {}}

    for dens in (0.5, 0.15):
        key = jax.random.PRNGKey(7)
        diffs = (jax.random.uniform(key, (args.batch, n_pad)) < dens)
        # padded spins always agree
        active = jnp.asarray(blocked.active)
        diffs = diffs & active[None, :]

        # parity reference via the library sparse path (first element)
        s1 = jnp.ones((n_pad,), jnp.float32)
        s2 = jnp.where(diffs[0], -1.0, 1.0)
        # library path works on blocked indexing too (src/dst are
        # original-index; rebuild in blocked coordinates)
        bsrc = jnp.asarray(blocked.inv_perm)[src]
        bdst = jnp.asarray(blocked.inv_perm)[dst]
        ref = disagreement_labels_sparse(bsrc, bdst, s1, s2,
                                         num_nodes=n_pad)

        row = {}
        for vname, (builder, spc, jump) in VARIANTS.items():
            try:
                if vname.startswith("sparse"):
                    # sparse variants index ORIGINAL ids; use blocked ids
                    def bprop(diff, _b=builder):
                        edge_active = diff[bsrc] & diff[bdst]

                        def propagate(labels):
                            cand = jnp.where(edge_active, labels[bsrc], big)
                            return jax.ops.segment_min(
                                cand, bdst, num_segments=n_pad)
                        return propagate
                    builder_ = bprop
                else:
                    builder_ = builder
                labels, iters = run_variant(builder_, spc, jump, diffs)
                ok = bool(jnp.array_equal(labels[0], ref))
                t = timeit(lambda: run_variant(builder_, spc, jump, diffs))
                row[vname] = {"seconds": t, "parity": ok,
                              "iters_max": int(jnp.max(iters))}
                print(f"dens={dens} {vname}: {t*1e3:.2f} ms "
                      f"parity={ok} iters<={int(jnp.max(iters))}",
                      flush=True)
            except Exception as e:   # keep profiling the rest
                row[vname] = {"error": repr(e)}
                print(f"dens={dens} {vname}: ERROR {e!r}", flush=True)
        out["densities"][str(dens)] = row

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "densities"}))


if __name__ == "__main__":
    main()
