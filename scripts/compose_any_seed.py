"""Compose campaign runs of the SAME family across RNG seeds/budgets.

Ground-state hits compose across independent runs: an instance counts as
solved if ANY run hit it (each hit is f64-re-verified against the shipped
exact energy before it is recorded, so a hit in any stream is exact).
This mirrors how the reference reports multi-restart success
(/root/reference/NPT/npt.py repeats runs over seeds and aggregates), but
over our batched-ensemble campaign JSONLs.

Usage:
  python scripts/compose_any_seed.py results/campaign/chimera2048_icm_10M.jsonl \
      results/campaign/chimera2048_icm_10M_seed1.jsonl

Prints a per-instance table (hit-by-run, best residual) and a composed
summary line suitable for docs/BENCHMARKS.md.
"""

import json
import sys


def load(path):
    recs = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        # keep the LAST record per instance (crash-snapshot chunks are
        # superseded by later chunks of the same run)
        recs[r["name"]] = r
    return recs


def main(paths):
    runs = [(p, load(p)) for p in paths]
    names = sorted({n for _, recs in runs for n in recs})
    solved = 0
    print(f"{'instance':<28} " +
          " ".join(f"run{i}" for i in range(len(runs))) +
          "   best_residual")
    for n in names:
        hits, residuals = [], []
        for _, recs in runs:
            r = recs.get(n)
            hits.append("HIT " if (r and r["hit"]) else
                        ("  . " if r else "  - "))
            if r is not None and r.get("residual") is not None:
                residuals.append(r["residual"])
        any_hit = "HIT " in hits
        solved += any_hit
        best = min(residuals) if residuals else float("nan")
        print(f"{n:<28} " + " ".join(hits) + f"   {best:.4f}")
    print(f"\ncomposed: {solved}/{len(names)} instances solved in >=1 run "
          f"({len(runs)} runs: {', '.join(p for p, _ in runs)})")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1:])
