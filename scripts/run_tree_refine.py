"""Induced-tree descent (nmc_tpu/tree_moves.py) over a family's
uncovered misses, from the best saved state per instance.

For each instance not yet hit by any tier, loads the lower-energy of
its saved beam state (results/beam_states/<family>) and campaign best
state (results/best_states/<family>), runs the monotone tree descent,
optionally an iterated-local-search loop (2x2-cell-block kicks — the
cycle shape no induced tree can contain — plus noise, re-descended),
and records a row per instance. Improved states are written back to
the beam-state pool so every later seeded run starts lower.

Rows go to results/tree_refine_<family>.jsonl with the same hit
criterion as the beam tier (exact integer match of the shipped truth:
groundstates_otn2d.txt / DCL *_sol.txt via the evaluation harness).

Usage:
  python scripts/run_tree_refine.py --family chimera2048
      [--ils-seconds 0] [--only a.txt,b.txt] [--deadline E]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_beam_chimera import FAMILIES  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--ils-seconds", type=float, default=0.0,
                    help="per-instance iterated-local-search budget "
                         "after the plain descent (0 = descent only)")
    ap.add_argument("--extra-random", type=int, default=24)
    ap.add_argument("--only", default=None)
    ap.add_argument("--deadline", type=float, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    from coverage_report import scan_family
    from nmc_tpu.beam_chimera import pad_to_chimera_grid
    from nmc_tpu.beam_chimera_tpu import quantize_problem
    from nmc_tpu.evaluation import (chimera_folder_instances,
                                    dcl_folder_instances)
    from nmc_tpu.io.loaders import read_otn2d_groundstates
    from nmc_tpu.tree_moves import tree_refine

    out = args.out or f"results/tree_refine_{args.family}.jsonl"
    done = set()
    if os.path.exists(out):
        done = {json.loads(line)["name"] for line in open(out)}
    tiers = scan_family(args.family)
    covered = set().union(*tiers.values()) if tiers else set()

    if args.family.startswith("dcl"):
        it = dcl_folder_instances(FAMILIES[args.family])
        truth_states = {}
    else:
        it = chimera_folder_instances(FAMILIES[args.family])
        truth_states = read_otn2d_groundstates(
            os.path.join(FAMILIES[args.family], "groundstates_otn2d.txt"))

    only = set(args.only.split(",")) if args.only else None
    bdir = f"results/beam_states/{args.family}"
    cdir = f"results/best_states/{args.family}"

    hits = total = 0
    for name, prob, gs in it:
        if name in done or name in covered:
            continue
        if only is not None and name not in only:
            continue
        if args.deadline and time.time() > args.deadline:
            print("DEADLINE reached, stopping cleanly", flush=True)
            break
        solve_prob, rows, cols, n_orig = pad_to_chimera_grid(prob)
        Jq, hq, q = quantize_problem(solve_prob)

        def int_e(s):
            si = np.where(np.asarray(s) >= 0, 1, -1).astype(np.int64)
            return int(-(si @ Jq @ si) // 2 - hq @ si)

        # best available saved state (beam pass and/or campaign best)
        cands = []
        for d in (bdir, cdir):
            p = os.path.join(d, name)
            if os.path.exists(p):
                s = np.ones(solve_prob.n)
                s[:n_orig] = np.sign(np.loadtxt(p).reshape(-1))
                cands.append((int_e(s), s))
        if not cands:
            continue
        e0, s0 = min(cands, key=lambda t: t[0])

        truth_spins = (truth_states[name][1] if name in truth_states
                       else np.zeros(0))
        if truth_spins.size == n_orig:
            st = np.ones(solve_prob.n, np.int64)
            st[:n_orig] = truth_spins
            target_int = int_e(st)
        elif gs is not None:
            target_int = int(round(gs * q))
        else:
            target_int = None
        stop = ((target_int / q) + 0.5 / q
                if target_int is not None else None)

        t0 = time.perf_counter()
        e, s, mv = tree_refine(solve_prob, s0, rows=rows, cols=cols,
                               stop_at=stop, seed=0,
                               extra_random=args.extra_random)
        ei = int_e(s)
        ils_iters = 0
        if (args.ils_seconds > 0 and target_int is not None
                and ei > target_int):
            rng = np.random.default_rng(1)
            best_e, best_s = ei, s.copy()
            t_ils = time.perf_counter()
            while (time.perf_counter() - t_ils < args.ils_seconds
                   and best_e > target_int):
                if args.deadline and time.time() > args.deadline:
                    break
                ils_iters += 1
                sk = best_s.copy()
                r0 = int(rng.integers(rows - 1))
                c0 = int(rng.integers(cols - 1))
                for (r, c) in ((r0, c0), (r0 + 1, c0),
                               (r0, c0 + 1), (r0 + 1, c0 + 1)):
                    b = (r * cols + c) * 8
                    sk[b:b + 8] *= -1
                sk[rng.random(solve_prob.n) < 0.02] *= -1
                _, sk, _ = tree_refine(
                    solve_prob, sk, rows=rows, cols=cols, stop_at=stop,
                    seed=int(rng.integers(1 << 30)),
                    extra_random=8, max_rounds=50)
                ek = int_e(sk)
                if ek < best_e:
                    best_e, best_s = ek, sk.copy()
                    mv += 1
            ei, s = best_e, best_s
        dt = time.perf_counter() - t0

        hit = (None if target_int is None else bool(ei <= target_int))
        total += 1
        hits += bool(hit)
        if ei < e0:
            os.makedirs(bdir, exist_ok=True)
            tmp = os.path.join(bdir, name + ".tmp")
            np.savetxt(tmp, np.where(s[:n_orig] >= 0, 1, -1).astype(np.int8),
                       fmt="%d")
            os.replace(tmp, os.path.join(bdir, name))
        rec = {"name": name, "family": args.family,
               "e_int_start": e0, "e_int": ei, "q": q, "gs": gs,
               "target_int": target_int, "hit": hit,
               "moves": mv, "ils_iters": ils_iters,
               "seconds": round(dt, 2), "stage": "tree_refine"}
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{name}: e_int={ei} (start {e0}) target={target_int} "
              f"hit={hit} moves={mv} ils={ils_iters} ({dt:.0f}s)",
              flush=True)
    print(f"SUMMARY {args.family} tree_refine: {hits}/{total} converted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
