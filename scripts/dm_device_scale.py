"""Device difference-map recovery at scale: generate continuum (float)
Wishart-planted instances at N in {256, 512, 1024} with our redesigned
generator (the regime where single-eigenvector rounding fails ~half the
time), run `difference_map_rounding_device` + `batched_descent_device`
on the accelerator, and report recovery + wall time per size.

This is the TPU-resident preconditioning story for the spectral stage:
eigh on host (f64, once per instance), the DM search + descent as
[C, n] x [n, d] MXU matmuls. Writes one JSON line per size to
results/dm_device_scale.json.

Usage: python scripts/dm_device_scale.py [--cpu] [--sizes 256,512,1024]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sizes", default="256,512,1024")
    ap.add_argument("--instances", type=int, default=4)
    ap.add_argument("--starts", type=int, default=512)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--alpha", type=float, default=0.25)
    ap.add_argument("--out", default="results/dm_device_scale.json")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from nmc_tpu.io.generators import wishart_planted
    from nmc_tpu.ops.spectral import (batched_descent_device,
                                      difference_map_rounding_device)
    from nmc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    @jax.jit
    def dm_solve(V, J):
        S = difference_map_rounding_device(
            V, num_starts=args.starts, iters=args.iters)
        S = batched_descent_device(J, S)
        E = -0.5 * jnp.sum(S * (S @ J), axis=1)
        i = jnp.argmin(E)
        return S[i], E[i]

    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        d = n - int(round(args.alpha * n))
        hits = 0
        walls = []
        for inst in range(args.instances):
            prob, t, gs = wishart_planted(n, args.alpha, seed=100 + inst)
            J = np.asarray(prob.J, np.float64)
            w, v = np.linalg.eigh(J)            # host, f64, once
            V = jnp.asarray(v[:, n - d:], jnp.float32)
            Jd = jnp.asarray(J, jnp.float32)
            s, e = dm_solve(V, Jd)              # compile on first instance
            s.block_until_ready()
            t0 = time.perf_counter()
            s, e = dm_solve(V, Jd)
            s.block_until_ready()
            walls.append(time.perf_counter() - t0)
            s64 = np.asarray(s, np.float64)
            e64 = -0.5 * s64 @ J @ s64
            hits += bool(e64 <= gs + max(1e-6 * abs(gs), 1e-9))
        row = dict(n=n, d=d, alpha=args.alpha, instances=args.instances,
                   hits=hits, wall_median=float(np.median(walls)),
                   starts=args.starts, iters=args.iters,
                   platform=jax.devices()[0].platform)
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
