"""Sweep a chimera-family folder with the beam boundary-DP solver and
verify against the shipped truths (groundstates_otn2d.txt for the
droplet families, NN_sol.txt planted energies for DCL).

The deterministic counterpart of the MCMC campaign arms: one JSONL line
per instance with the beam energy, the shipped truth, hit/miss at the
truth's print precision, wall time and beam telemetry. Resumable (lines
already present are skipped).

Usage:
  python scripts/run_beam_chimera.py --family chimera512 [--beam 18]
      [--limit K] [--orientations 4] [--out results/beam_<family>.jsonl]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DROPLET = "/root/reference/NMC/examples/Chimera_droplet_instances"
FAMILIES = {
    "chimera128": f"{DROPLET}/chimera128_spinglass_power",
    "chimera512": f"{DROPLET}/chimera512_spinglass_power",
    "chimera1152": f"{DROPLET}/chimera1152_spinglass_power",
    "chimera2048": f"{DROPLET}/chimera2048_spinglass_power",
    "dcl8": "/root/reference/NMC/examples/DCL_instances/C8",
    "dcl16": "/root/reference/NMC/examples/DCL_instances/C16",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--beam", type=int, default=18,
                    help="log2 of the beam width")
    ap.add_argument("--orientations", type=int, default=1)
    ap.add_argument("--refine", action="store_true",
                    help="exact strip refinement after the beam")
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--save-states", default=None,
                    help="directory for per-instance best states")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--deadline", type=float, default=None,
                    help="epoch seconds; stop cleanly when passed")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    from nmc_tpu.beam_chimera import (pad_to_chimera_grid,
                                      solve_beam_chimera_multi,
                                      solve_chimera_pipeline)
    from nmc_tpu.evaluation import (chimera_folder_instances,
                                    dcl_folder_instances)
    from nmc_tpu.io.loaders import read_otn2d_groundstates

    out = args.out or f"results/beam_{args.family}_b{args.beam}.jsonl"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    done = set()
    if os.path.exists(out):
        with open(out) as f:
            done = {json.loads(line)["name"] for line in f}

    folder = FAMILIES[args.family]
    if args.family.startswith("dcl"):
        it = dcl_folder_instances(folder, limit=args.limit)
        truth_states = {}
    else:
        it = chimera_folder_instances(folder, limit=args.limit)
        # the shipped truths print at 2-6 decimals; the spin vectors let
        # us target the EXACT truth-state energy in f64 instead
        truth_states = read_otn2d_groundstates(
            os.path.join(folder, "groundstates_otn2d.txt"))
    total = hits = 0
    for name, prob, gs in it:
        if name in done:
            continue
        if args.deadline and time.time() > args.deadline:
            print("DEADLINE reached, stopping cleanly")
            break
        target = gs
        if name in truth_states:
            target = float(prob.energy(
                truth_states[name][1].astype(np.float64)))
        t0 = time.perf_counter()
        solve_prob, rows, cols, n_orig = pad_to_chimera_grid(prob)
        if args.refine:
            e, s, info = solve_chimera_pipeline(
                solve_prob, rows=rows, cols=cols, beam=1 << args.beam,
                orientations=args.orientations, window=args.window)
        else:
            e, s, info = solve_beam_chimera_multi(
                solve_prob, rows=rows, cols=cols,
                beam=1 << args.beam, orientations=args.orientations)
        assert abs(float(prob.energy(s[:n_orig])) - e) < 1e-6
        dt = time.perf_counter() - t0
        if args.save_states:
            os.makedirs(args.save_states, exist_ok=True)
            np.savetxt(os.path.join(args.save_states, name),
                       s[:n_orig].astype(np.int8), fmt="%d")
        tol = 1e-7 * max(1.0, abs(target))
        hit = bool(e <= target + tol) if target is not None else None
        total += 1
        hits += bool(hit)
        rec = {"name": name, "family": args.family, "beam": args.beam,
               "energy": e, "gs": gs, "target": target, "hit": hit,
               "better": (target is not None and e < target - tol),
               "exact": info["exact"], "seconds": round(dt, 2),
               "refined_from": info.get("refined_from"),
               "strip_moves": info.get("strip_moves"),
               "orientations": [o["energy"] for o in
                                info["per_orientation"]]}
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{name}: e={e:.6f} gs={gs} hit={hit} ({dt:.0f}s)",
              flush=True)
    print(f"SUMMARY {args.family} beam=2^{args.beam}: "
          f"{hits}/{total} ground states")


if __name__ == "__main__":
    main()
