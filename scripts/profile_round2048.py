"""Profile the streamed whole-round Pallas kernel vs the XLA round at
chimera2048 scale (the campaign's biggest family), through EnsembleICM —
the exact configuration the deep-budget campaigns run.

Measures rounds/s and spin-flip attempts/s for round_kernel on/off on a
small instance batch, so the BENCHMARKS "known headroom" claims about the
2048-scale round kernel are measured rather than asserted.

Writes ONE JSON object to results/round2048_profile.json.

Run on an idle TPU:  python scripts/profile_round2048.py [--instances 2]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CHIMERA2048 = ("/root/reference/NMC/examples/Chimera_droplet_instances/"
               "chimera2048_spinglass_power")


def time_rounds(ens, state, rounds, reps=3):
    import jax
    state = ens.run_scanned(state, rounds)          # warmup + compile
    jax.block_until_ready(state.m)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        state = ens.run_scanned(state, rounds)
        jax.block_until_ready(state.m)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--replicas", type=int, default=32)
    ap.add_argument("--sweeps-per-round", type=int, default=96)
    ap.add_argument("--out", default="results/round2048_profile.json")
    args = ap.parse_args()

    import jax

    from nmc_tpu.evaluation import chimera_folder_instances
    from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
    from nmc_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    probs = [p for _, p, _ in
             chimera_folder_instances(CHIMERA2048, limit=args.instances)]
    probs = [p.normalized()[0] for p in probs]
    beta = np.geomspace(0.25, 32.0, args.replicas)

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind),
           "instances": args.instances, "replicas": args.replicas,
           "sweeps_per_round": args.sweeps_per_round,
           "rounds_timed": args.rounds}
    I, S, R = args.instances, 2, args.replicas
    n = probs[0].n
    attempts = I * S * R * n * args.sweeps_per_round * args.rounds

    # "on" auto-selects the VMEM-resident tile stack when it fits;
    # "on_streamed" forces the double-buffered HBM slab path for the A/B
    for mode in ("on", "on_streamed", "off"):
        kernel = "on" if mode.startswith("on") else mode
        cfg = EnsembleICMConfig(sweeps_per_round=args.sweeps_per_round,
                                num_subreplicas=S, num_swapping_pairs=4,
                                use_coloring=True,  # kernel gate: colored
                                round_kernel=kernel)  # Jacobi tile layout
        ens = EnsembleICM(probs, beta, cfg)
        if mode == "on_streamed":
            ens._stream_resident = False        # before any round builds
        state = ens.init_state(jax.random.PRNGKey(0))
        dt, state = time_rounds(ens, state, args.rounds)
        eb, _ = ens.best(state)
        out[f"kernel_{mode}"] = {
            "used_round_kernel": bool(ens._use_round_kernel),
            "resident": bool(getattr(ens, "_stream_resident", False)),
            "seconds": dt,
            "rounds_per_s": args.rounds / dt,
            "attempts_per_s": attempts / dt,
            "best_energies": [float(x) for x in np.asarray(eb)],
        }
        print(mode, out[f"kernel_{mode}"], flush=True)

    if out["kernel_on"]["used_round_kernel"]:
        out["speedup_kernel_vs_xla"] = (out["kernel_on"]["attempts_per_s"]
                                        / out["kernel_off"]["attempts_per_s"])
        out["speedup_resident_vs_streamed"] = (
            out["kernel_on"]["attempts_per_s"]
            / out["kernel_on_streamed"]["attempts_per_s"])
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, dict)}))


if __name__ == "__main__":
    main()
