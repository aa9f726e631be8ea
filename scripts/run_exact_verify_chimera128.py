"""Independently re-derive every shipped chimera128 ground truth with
the exact tropical-DP chimera solver (nmc_tpu/exact_chimera.py).

The reference's chimera truths are external tnac4o artifacts
(groundstates_otn2d.txt); nothing in the repo can reproduce them. This
sweep proves each of the ~100 C4 instances from scratch (boundary DP,
~40 s/instance on one host core; no accelerator needed).

One JSON line per instance appended to
results/exact_verify_chimera128.jsonl (resume: instances already
present are skipped). `match` compares at the truth file's print
precision (6 decimals).

Usage: python scripts/run_exact_verify_chimera128.py [--limit K]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FOLDER = ("/root/reference/NMC/examples/Chimera_droplet_instances/"
          "chimera128_spinglass_power")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out",
                    default="results/exact_verify_chimera128.jsonl")
    args = ap.parse_args(argv)

    from nmc_tpu import IsingProblem
    from nmc_tpu.evaluation import chimera_folder_instances
    from nmc_tpu.exact_chimera import solve_exact_chimera
    from nmc_tpu.io.loaders import read_otn2d_groundstates

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["name"] for line in f}
    # the reference also ships per-instance MAXIMUM energies — the same
    # DP on the negated problem re-derives those for free
    emax = read_otn2d_groundstates(os.path.join(FOLDER,
                                                "max_energy_otn2d.txt"))

    total = match = 0
    for name, prob, gs in chimera_folder_instances(FOLDER,
                                                   limit=args.limit):
        if name in done:
            continue
        t0 = time.perf_counter()
        e, s = solve_exact_chimera(prob)
        neg = IsingProblem(-prob.J, -prob.h, name=prob.name)
        e_neg, _ = solve_exact_chimera(neg)
        mx = -e_neg
        mx_shipped = emax[name][0] if name in emax else None
        rec = dict(name=name, n=prob.n, exact=e, shipped=gs,
                   match=bool(abs(e - gs) <= 2e-6 * abs(gs)),
                   exact_max=mx, shipped_max=mx_shipped,
                   match_max=(None if mx_shipped is None else
                              bool(abs(mx - mx_shipped)
                                   <= 2e-6 * abs(mx_shipped))),
                   wall_s=round(time.perf_counter() - t0, 2))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        total += 1
        match += rec["match"]
    print(f"TOTAL this run: {match}/{total} shipped chimera128 truths "
          "re-derived exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
