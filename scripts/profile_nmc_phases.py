"""Phase-level breakdown of the EnsembleNMC round at DCL C16 scale.

The matmul Houdayer fix (round 3) removed the ICM arm's non-sweep
bottleneck. This script asks the same question for the NMC arm, whose
per-round extras are the convexified-LBP backbone refresh + cluster
mask build (ops/lbp_jit) instead of Houdayer label propagation:

  1. full EnsembleNMC round, lbp_every=1 (refresh every round)
  2. full round, lbp_every=8 (the campaign default is 4-8)
  3. full round with the backbone refresh OFF (lbp_every > num rounds)

(3)-(1) isolates the LBP+cluster share; if it dominates like Houdayer
did, the same one-hot-plane treatment (at Precision.HIGHEST for float
messages) is the round-4 lever.

Writes results/nmc_phase_breakdown.json.

Run on an idle TPU:  python scripts/profile_nmc_phases.py
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

DCL16 = "/root/reference/NMC/examples/DCL_instances/C16"


def timeit(fn, reps=5):
    # force a scalar device->host fetch per capture: block_until_ready
    # through the axon tunnel has been observed returning before device
    # work completes (docs/BENCHMARKS.md "TIMING CORRECTION")
    import jax.numpy as jnp
    float(jnp.sum(fn()))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(jnp.sum(fn()))
        dt = time.perf_counter() - t0
        assert s == s
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--replicas", type=int, default=32)
    ap.add_argument("--sweeps-per-phase", type=int, default=64)
    ap.add_argument("--nmc-cold", type=int, default=6)
    ap.add_argument("--round-kernel", default="auto")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="results/nmc_phase_breakdown.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nmc_tpu.evaluation import dcl_folder_instances
    from nmc_tpu.parallel import EnsembleNMC, ShardedNPTConfig
    from nmc_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    probs = [p for _, p, _ in
             dcl_folder_instances(DCL16, limit=args.instances)]
    probs = [p.normalized()[0] for p in probs]
    beta = np.geomspace(0.25, 32.0, args.replicas)
    doNMC = [False] * (args.replicas - args.nmc_cold) + \
            [True] * args.nmc_cold

    out = {"backend": jax.default_backend(),
           "instances": args.instances, "replicas": args.replicas,
           "sweeps_per_phase": args.sweeps_per_phase,
           "nmc_cold": args.nmc_cold, "rounds_timed": args.rounds}
    for label, lbp_every, lbp_mode in (
            ("lbp_every_1", 1, "auto"), ("lbp_every_8", 8, "auto"),
            ("lbp_off", 10 ** 6, "auto"),
            ("lbp_planes_every_1", 1, "planes")):
        cfg = ShardedNPTConfig(sweeps_per_phase=args.sweeps_per_phase,
                               use_coloring=True,
                               round_kernel=args.round_kernel,
                               lbp_mode=lbp_mode,
                               lbp_every=lbp_every)
        ens = EnsembleNMC(probs, beta, doNMC, cfg)
        state = ens.init_state(jax.random.PRNGKey(0))

        def run():
            return ens.run_scanned(state, args.rounds).m
        t = timeit(run)
        out[label + "_s_per_round"] = t / args.rounds
        print(f"{label}: {t / args.rounds * 1e3:.1f} ms/round", flush=True)

    lbp1 = out["lbp_every_1_s_per_round"]
    off = out["lbp_off_s_per_round"]
    out["lbp_share_of_round_at_every_1"] = (lbp1 - off) / lbp1
    pl = out.get("lbp_planes_every_1_s_per_round")
    if pl:
        out["planes_speedup_full_round"] = lbp1 / pl
        out["planes_speedup_lbp_stage"] = ((lbp1 - off) / (pl - off)
                                           if pl > off else float("inf"))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
