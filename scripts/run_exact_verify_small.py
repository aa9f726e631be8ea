"""Independently re-derive every shipped wishart ground truth at small N
with the exact meet-in-the-middle solver (nmc_tpu/exact.py, host tier) —
a proof-grade check of the instance loaders, energy conventions, and the
shipped gs_energies.txt files themselves.

Writes one JSON line per folder to results/exact_verify_small.jsonl:
{"folder": ..., "n": N, "instances": K, "exact_matches": M, "wall_s": W}

Usage: python scripts/run_exact_verify_small.py [--max-n 26] [--limit K]
"""
import argparse
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOTS = ["/root/reference/NPT/examples/wishart_small",
         "/root/reference/NMC/examples/contrived_wishart_backbone"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-n", type=int, default=26)
    ap.add_argument("--limit", type=int, default=None,
                    help="instances per folder (default: all)")
    ap.add_argument("--out", default="results/exact_verify_small.jsonl")
    args = ap.parse_args(argv)

    from nmc_tpu.evaluation import wishart_folder_instances
    from nmc_tpu.exact import solve_exact_host

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["folder"] for line in f}

    folders = sorted(f for r in ROOTS
                 for f in glob.glob(os.path.join(r, "wishart_planting_N_*"))
                 if os.path.isdir(f))
    total = matches = 0
    for folder in folders:
        m = re.search(r"N_(\d+)", folder)
        n = int(m.group(1))
        base = os.path.basename(folder)
        if "contrived_wishart_backbone" in folder:
            base = "cwb_" + base   # same names exist in both roots
        if n > args.max_n or base in done:
            continue
        t0 = time.perf_counter()
        k = ok = okr = 0
        mism = []
        for name, prob, gs_raw in wishart_folder_instances(
                folder, limit=args.limit):
            e, s = solve_exact_host(prob)
            k += 1
            if e == gs_raw:         # integer folders: bitwise equality
                ok += 1
            elif abs(e - gs_raw) <= max(1e-6 * abs(gs_raw), 1e-9):
                # float-coupling folders ship truths printed to ~7
                # decimals; the exact energy agrees within that
                # rounding (and is strictly more precise)
                okr += 1
            else:
                mism.append(dict(name=name, shipped=gs_raw, exact=e))
        rec = dict(folder=base, n=n, instances=k, exact_matches=ok,
                   rounded_matches=okr, mismatches=mism,
                   wall_s=round(time.perf_counter() - t0, 2))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{base}: {ok}/{k} exact + {okr} within-print-rounding "
              f"({rec['wall_s']}s)", flush=True)
        total += k
        matches += ok + okr
    print(f"TOTAL: {matches}/{total} shipped truths re-derived "
          f"(exactly or within the truth files' own print rounding)")


if __name__ == "__main__":
    main()
