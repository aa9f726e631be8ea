"""Does per-dispatch tunnel latency contaminate short bench captures?

Hypothesis (from results/bench_reconcile.json vs bench_r3_tail):
forced-sync is necessary but not sufficient — a capture of iters=4
dispatches + 1 fetch spans ~0.28 s, of which 0.1-0.15 s can be axon
round-trip latency (50-200 ms/dispatch observed), so the measured rate
is 2x below the chip truth whenever the tunnel is slow. If so, the
attempts/s rate should RISE and PLATEAU as iters grows (work scales,
per-capture overhead fixed); if the 2x spread were real chip-state
variance, the rate would be flat in iters.

Runs bench.py's exact measure_tpu at iters 2..64, one process, idle
chip. Writes results/bench_amortize.json.
"""
import importlib.util
import json
import sys

sys.path.insert(0, "/root/repo")

if __name__ == "__main__":
    from nmc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    spec = importlib.util.spec_from_file_location("bm", "/root/repo/bench.py")
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    out = {}
    for iters in (2, 4, 8, 16, 32, 64):
        fps, dt = bm.measure_tpu(replicas=2048, sweeps=1024, iters=iters,
                                 reps=3)
        out[f"iters_{iters}"] = {"attempts_per_s": fps, "capture_s": dt,
                                 "per_step_s": dt / iters}
        print(f"iters={iters}: {fps:.3e} attempts/s "
              f"(capture {dt:.3f}s, {dt / iters * 1e3:.1f} ms/step)",
              flush=True)
    with open("results/bench_amortize.json", "w") as f:
        json.dump(out, f, indent=1)
