"""Induced-tree descent over a family's uncovered misses — thin
wrapper over the product component `nmc_tpu.refine.refine_family`
(which loads the lower-energy of each miss's saved beam/campaign
state, runs the monotone tree descent + optional ILS kicks, writes
improved states back to the seed pool, and appends rows to
results/tree_refine_<family>.jsonl). Kept as a script entry point for
the resumable campaign chains; the same surface is reachable via
`python -m nmc_tpu refine --family <fam>` and `campaign --refine tree`.

Usage:
  python scripts/run_tree_refine.py --family chimera2048
      [--ils-seconds 0] [--only a.txt,b.txt] [--deadline E]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True)
    ap.add_argument("--ils-seconds", type=float, default=0.0,
                    help="per-instance iterated-local-search budget "
                         "after the plain descent (0 = descent only)")
    ap.add_argument("--extra-random", type=int, default=24)
    ap.add_argument("--only", default=None)
    ap.add_argument("--deadline", type=float, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from nmc_tpu.refine import refine_family
    refine_family(args.family,
                  only=args.only.split(",") if args.only else None,
                  ils_seconds=args.ils_seconds,
                  extra_random=args.extra_random,
                  deadline=args.deadline, out=args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
