"""Bench harness latency study: how much device work per timed capture
does the axon tunnel need before attempts/s reflects the CHIP instead of
the tunnel's dispatch latency?

The driver's bench artifact swung 1.14e11 (r1) -> 7.6e10 (r2) -> 3.0e10
(post-outage r3 tail) on UNCHANGED kernels; each capture times iters
jitted steps whose total device work is O(10 ms) — same scale as the
tunnel round trip. This sweeps (sweeps/step, iters, replicas) and prints
attempts/s per config so the capture size can be set where throughput
plateaus (chip-bound) rather than on the latency cliff.

Writes results/bench_tune.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import numpy as np

    from bench import measure_tpu
    from nmc_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    out = []
    # (replicas, sweeps per step, iters per capture)
    grid = [
        (512, 64, 20),     # the shipped capture (r2/r3 artifact config)
        (512, 64, 100),
        (512, 256, 25),
        (512, 1024, 8),
        (1024, 256, 25),
        (1024, 1024, 8),
        (2048, 1024, 4),
    ]
    for reps, sweeps, iters in grid:
        t0 = time.perf_counter()
        fps, dt = measure_tpu(n=1024, replicas=reps, sweeps=sweeps,
                              iters=iters)
        rec = {"replicas": reps, "sweeps": sweeps, "iters": iters,
               "capture_s": dt, "attempts_per_s": fps,
               "wall_s": time.perf_counter() - t0}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open("results/bench_tune.json", "w") as f:
        json.dump(out, f, indent=1)
    best = max(out, key=lambda r: r["attempts_per_s"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
