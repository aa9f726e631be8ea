"""Independently re-derive the LARGE-N shipped wishart ground truths
(N = 34..40, host-infeasible) with the exact meet-in-the-middle Pallas
tier on TPU — together with scripts/run_exact_verify_small.py (host tier,
N <= 32) this proves every `gs_energies.txt` value in
/root/reference/NPT/examples/wishart_small/ from scratch.

One JSON line per folder appended to results/exact_verify_tpu.jsonl
(same schema as the small-N verifier: exact / rounded-print matches);
per-instance progress lines stream to stdout. Folders already in the
output file are skipped, and a wall-clock budget stops cleanly between
instances (partial folders are re-run on resume), so the run is
deadline-safe for the TPU queue.

Usage: python scripts/run_exact_verify_tpu.py [--min-n 34] [--max-n 40]
           [--budget-s 7200] [--planes auto]
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
    ap.add_argument("--min-n", type=int, default=34)
    ap.add_argument("--max-n", type=int, default=40)
    ap.add_argument("--budget-s", type=float, default=7200.0,
                    help="stop cleanly after this much wall clock")
    ap.add_argument("--limit", type=int, default=None,
                    help="instances per folder (default: all)")
    ap.add_argument("--planes", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--block-a", type=int, default=512)
    ap.add_argument("--block-b", type=int, default=4096)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode Pallas (CPU smoke, tiny n only)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars do not "
                         "override the axon plugin)")
    ap.add_argument("--out", default="results/exact_verify_tpu.jsonl")
    args = ap.parse_args(argv)
    t_start = time.perf_counter()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from nmc_tpu.evaluation import wishart_folder_instances
    from nmc_tpu.exact import solve_exact_pallas
    from nmc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["folder"] for line in f}

    folders = sorted((f for r in ROOTS
                  for f in glob.glob(os.path.join(r, "wishart_planting_N_*"))
                  if os.path.isdir(f)),
                 key=lambda p: (int(re.search(r"N_(\d+)", p).group(1)), p))
    for folder in folders:
        n = int(re.search(r"N_(\d+)", folder).group(1))
        base = os.path.basename(folder)
        if "contrived_wishart_backbone" in folder:
            base = "cwb_" + base   # same names exist in both roots
        if not (args.min_n <= n <= args.max_n) or base in done:
            continue
        if time.perf_counter() - t_start > args.budget_s:
            print(f"BUDGET: stopping before {base}", flush=True)
            return 0
        t0 = time.perf_counter()
        k = ok = okr = 0
        mism = []
        for name, prob, gs in wishart_folder_instances(folder,
                                                       limit=args.limit):
            e, _ = solve_exact_pallas(prob, block_a=args.block_a,
                                      block_b=args.block_b,
                                      planes=args.planes,
                                      interpret=args.interpret)
            k += 1
            if e == gs:             # integer folders: bitwise equality
                ok += 1
            elif abs(e - gs) <= max(1e-6 * abs(gs), 1e-9):
                # float-coupling folders ship truths printed to ~7
                # decimals (same convention as the small-N verifier)
                okr += 1
            else:
                mism.append(dict(name=name, shipped=gs, exact=e))
            print(f"{base} {name}: exact={e} shipped={gs}", flush=True)
        rec = dict(folder=base, n=n, instances=k, exact_matches=ok,
                   rounded_matches=okr, mismatches=mism,
                   wall_s=round(time.perf_counter() - t0, 2))
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
