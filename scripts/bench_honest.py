"""Honest idle-chip throughput measurement with FORCED device->host
sync: times from dispatch of a serial step chain to the arrival of a
scalar reduction of the final state on the host. block_until_ready
through the axon tunnel has been observed returning far too early on an
idle chip (bench_tune.json capture times imply >370 TFLOP/s, above v5e
bf16 peak — physically impossible), so every capture here ends with
float(jnp.sum(m)), which cannot complete before the computation does.

Writes results/bench_honest.json with per-config rates and the implied
MXU FLOP/s so impossibility is self-checked.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def measure(n, replicas, sweeps, iters, within_block="sequential"):
    import jax
    import jax.numpy as jnp

    from nmc_tpu.io.generators import random_sk
    from nmc_tpu.ops.engine import SweepEngine
    from nmc_tpu.ops.sweeps import run_sweeps

    prob = random_sk(n, seed=0).normalized()[0]
    engine = SweepEngine(prob, block_size=128, within_block=within_block)
    m = engine.init_states(jax.random.PRNGKey(0), replicas)
    phi = engine.fields(m)
    bs = jnp.full((sweeps,), 2.0, jnp.float32)
    ones = jnp.ones((), jnp.float32)
    mask = jnp.broadcast_to(engine.active, (replicas, engine.n_pad))

    def step(m, phi, k):
        r = run_sweeps(engine.J_rows, engine.J_diag, engine.h, m, phi, k,
                       bs, ones, mask, num_sweeps=sweeps,
                       within_block=engine.within_block,
                       block_order="fixed", record_m=False)
        return r.m, r.phi

    m, phi = step(m, phi, jax.random.PRNGKey(1))
    float(jnp.sum(m))                      # full sync after warmup
    samples = []
    for rep in range(5):
        t0 = time.perf_counter()
        for i in range(iters):
            m, phi = step(m, phi, jax.random.PRNGKey(2 + rep * iters + i))
        sync = float(jnp.sum(m))           # forced transfer = real sync
        samples.append(time.perf_counter() - t0)
        assert sync == sync
    import numpy as np
    dt = float(np.median(samples))
    attempts = iters * sweeps * replicas * prob.n
    # phi-update matmul work: per sweep, n_pad/128 blocks x
    # [n_pad,128]@[128,R] (2 flops/MAC)
    flops = iters * sweeps * (engine.n_pad // 128) \
        * (engine.n_pad * 128 * replicas * 2)
    return {"n": n, "replicas": replicas, "sweeps": sweeps,
            "iters": iters, "within_block": within_block,
            "capture_s": dt, "attempts_per_s": attempts / dt,
            "implied_tflops": flops / dt / 1e12,
            "samples": samples}


def main():
    from nmc_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    out = []
    for cfg in [
        dict(n=1024, replicas=512, sweeps=64, iters=20),
        dict(n=1024, replicas=512, sweeps=1024, iters=4),
        dict(n=1024, replicas=1024, sweeps=1024, iters=4),
        dict(n=1024, replicas=2048, sweeps=1024, iters=2),
        dict(n=1024, replicas=1024, sweeps=1024, iters=4,
             within_block="jacobi"),
    ]:
        rec = measure(**cfg)
        out.append(rec)
        print(json.dumps(rec), flush=True)
    with open("results/bench_honest.json", "w") as f:
        json.dump(out, f, indent=1)
    best = max(out, key=lambda r: r["attempts_per_s"])
    print("BEST:", json.dumps({k: best[k] for k in
                               ("replicas", "sweeps", "attempts_per_s",
                                "implied_tflops")}))


if __name__ == "__main__":
    main()
