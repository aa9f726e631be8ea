"""Phase-level breakdown of the EnsembleICM round at chimera2048 scale.

The round-kernel profile (results/round2048_profile.json) showed the
streamed round kernel only buys 1.11x end-to-end at 2048 (vs 1.39x on
chimera512 ShardedNPT), which means non-sweep work dominates the round.
This script times the three round components separately, at the exact
deep-budget campaign configuration, to locate the bottleneck:

  1. the sweep stage alone       (round kernel, same op the campaign runs)
  2. houdayer_move_sparse alone  (vmapped over instances x pairs)
  3. full EnsembleICM round      (sweeps + houdayer + energies + swaps)

Writes results/icm_phase_breakdown.json.

Run on an idle TPU:  python scripts/profile_icm_phases.py [--instances 2]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CHIMERA2048 = ("/root/reference/NMC/examples/Chimera_droplet_instances/"
               "chimera2048_spinglass_power")


def timeit(fn, reps=5):
    import jax
    jax.block_until_ready(fn())           # warmup/compile
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--replicas", type=int, default=32)
    ap.add_argument("--sweeps-per-round", type=int, default=96)
    ap.add_argument("--round-kernel", default="on")  # off for CPU smoke
    ap.add_argument("--limit-edges", type=int, default=0)
    ap.add_argument("--out", default="results/icm_phase_breakdown.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nmc_tpu.evaluation import chimera_folder_instances
    from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
    from nmc_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    probs = [p for _, p, _ in
             chimera_folder_instances(CHIMERA2048, limit=args.instances)]
    probs = [p.normalized()[0] for p in probs]
    beta = np.geomspace(0.25, 32.0, args.replicas)
    cfg = EnsembleICMConfig(sweeps_per_round=args.sweeps_per_round,
                            num_subreplicas=2, num_swapping_pairs=4,
                            use_coloring=True,
                            round_kernel=args.round_kernel)
    ens = EnsembleICM(probs, beta, cfg)
    state = ens.init_state(jax.random.PRNGKey(0))
    out = {"backend": jax.default_backend(),
           "instances": args.instances, "replicas": args.replicas,
           "sweeps_per_round": args.sweeps_per_round,
           "rounds_timed": args.rounds}

    # --- full round (the campaign op) ---------------------------------
    def full():
        return ens.run_scanned(state, args.rounds).m
    t_full = timeit(full)
    out["full_round_s_per_round"] = t_full / args.rounds

    # --- houdayer alone, same shapes (mirrors ensemble_icm.py:352-356,
    # S=2 so one pair of [R, n_pad] states per instance) ---------------
    from nmc_tpu.ops.clusters import houdayer_move_sparse
    src, dst = ens.src, ens.dst                  # [I, E_pad] padded lists
    I = args.instances
    R = args.replicas
    m = state.m                                  # [I, S, R, n_pad]
    k = jax.random.PRNGKey(1)

    @jax.jit
    def houd(m, k):
        def one(src_i, dst_i, m_i, kk):
            keys = jax.random.split(kk, R)
            return jax.vmap(lambda a, b, q: houdayer_move_sparse(
                src_i, dst_i, a, b, q))(m_i[0], m_i[1], keys)[0]
        keys = jax.random.split(k, I)
        return jax.vmap(one)(src, dst, m, keys)
    t_houd = timeit(lambda: houd(m, k))
    # one houdayer exchange per round in the campaign config
    out["houdayer_s_per_round"] = t_houd

    # --- blocked-tile houdayer (the 'auto' fast path when the streamed
    # round kernel's union tiles are resident) ------------------------
    if ens._houd_tiles is not None:
        from nmc_tpu.ops.clusters import houdayer_move_blocked
        col_idx, J_tiles = ens._houd_tiles       # [nB,K], [I,nB,K,B,B]

        @jax.jit
        def houd_blk(m, k):
            def one(Jt_i, m_i, kk):
                adj = Jt_i != 0
                keys = jax.random.split(kk, R)
                return jax.vmap(lambda a, b, q: houdayer_move_blocked(
                    col_idx, adj, a, b, q))(m_i[0], m_i[1], keys)[0]
            keys = jax.random.split(k, I)
            return jax.vmap(one)(J_tiles, m, keys)
        t_blk = timeit(lambda: houd_blk(m, k))
        out["houdayer_blocked_s_per_round"] = t_blk
        out["houdayer_blocked_speedup"] = t_houd / t_blk
        # parity: identical moves for identical keys
        a = jax.device_get(houd(m, k))
        b = jax.device_get(houd_blk(m, k))
        out["houdayer_blocked_parity"] = bool(np.array_equal(a, b))

    # --- matmul houdayer (one-hot neighbor planes, the 'auto' default
    # on bounded-degree families since round 3) ------------------------
    if ens._houd_planes is not None:
        from nmc_tpu.ops.clusters import NeighborPlanes, houdayer_move_matmul
        G, Pstack = ens._houd_planes

        @jax.jit
        def houd_mm(m, k):
            def one(P_i, m_i, kk):
                pl = NeighborPlanes(G, P_i, m.shape[-1], 128)
                keys = jax.random.split(kk, R)
                return jax.vmap(lambda a, b, q: houdayer_move_matmul(
                    pl, a, b, q))(m_i[0], m_i[1], keys)[0]
            keys = jax.random.split(k, I)
            return jax.vmap(one)(Pstack, m, keys)
        t_mm = timeit(lambda: houd_mm(m, k))
        out["houdayer_matmul_s_per_round"] = t_mm
        out["houdayer_matmul_speedup"] = t_houd / t_mm
        a = jax.device_get(houd(m, k))
        b = jax.device_get(houd_mm(m, k))
        out["houdayer_matmul_parity"] = bool(np.array_equal(a, b))

    # --- sweep stage alone: round kernel off vs on comparison ---------
    # (reuses round2048_profile.json numbers when present)
    try:
        prof = json.load(open("results/round2048_profile.json"))
        out["round2048_profile"] = {k: prof[k] for k in
                                    ("kernel_on", "kernel_off",
                                     "speedup_kernel_vs_xla")
                                    if k in prof}
    except Exception:
        pass

    out["houdayer_frac_of_round"] = out["houdayer_s_per_round"] / \
        out["full_round_s_per_round"]
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
