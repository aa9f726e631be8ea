"""Honest (forced-sync) throughput of the COLORED PALLAS sweep kernels —
the north-star path (BASELINE.json: "Pallas kernel over graph-colored
spin blocks with replicas batched along the vector dimension").

bench_honest.py established that the XLA SK path delivers 1.1e9
(sequential-exact) / 6.8e9 (jacobi) attempts/s once timing is forced to
wait for real completion; this measures the production kernels the
campaigns actually run: VMEM-resident colored Pallas on chimera512, the
tile-sparse streamed kernel on chimera2048, plus the honest SK numbers
for the record. Every capture ends in a scalar device->host fetch.

Writes results/bench_honest_pallas.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def measure_engine(prob, replicas, sweeps, iters, reps=5, **engine_kw):
    import jax
    import jax.numpy as jnp

    from nmc_tpu.ops.engine import SweepEngine

    engine = SweepEngine(prob, **engine_kw)
    m = engine.init_states(jax.random.PRNGKey(0), replicas)

    def step(m, k):
        res = engine.run(m, k, num_sweeps=sweeps, beta=2.0,
                         blocked_input=True, blocked_output=True)
        return res.m

    m = step(m, jax.random.PRNGKey(1))
    float(jnp.sum(m))
    samples = []
    for rep in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            m = step(m, jax.random.PRNGKey(2 + rep * iters + i))
        sync = float(jnp.sum(m))
        samples.append(time.perf_counter() - t0)
        assert sync == sync
    import numpy as np
    dt = float(np.median(samples))
    attempts = iters * sweeps * replicas * prob.n
    return {"replicas": replicas, "sweeps": sweeps, "iters": iters,
            "n": prob.n, "n_pad": engine.n_pad,
            "capture_s": dt, "attempts_per_s": attempts / dt,
            "samples": samples}


def main():
    from nmc_tpu.io.loaders import load_chimera
    from nmc_tpu.io.generators import random_sk
    from nmc_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    c512 = load_chimera(
        "/root/reference/NMC/examples/Chimera_droplet_instances/"
        "chimera512_spinglass_power/001.txt")
    c2048 = load_chimera(
        "/root/reference/NMC/examples/Chimera_droplet_instances/"
        "chimera2048_spinglass_power/001.txt")
    sk = random_sk(1024, seed=0).normalized()[0]

    grid = [
        ("c512_pallas_r1024", c512,
         dict(replicas=1024, sweeps=1024, iters=4),
         dict(use_coloring=True, backend="pallas")),
        ("c512_pallas_r2048", c512,
         dict(replicas=2048, sweeps=1024, iters=4),
         dict(use_coloring=True, backend="pallas")),
        ("c512_xla_colored", c512,
         dict(replicas=1024, sweeps=1024, iters=4),
         dict(use_coloring=True, backend="xla")),
        ("c2048_pallas_r256", c2048,
         dict(replicas=256, sweeps=512, iters=4),
         dict(use_coloring=True, backend="pallas")),
        ("c2048_pallas_r1024", c2048,
         dict(replicas=1024, sweeps=512, iters=2),
         dict(use_coloring=True, backend="pallas")),
        ("sk1024_seq_exact", sk,
         dict(replicas=1024, sweeps=256, iters=2),
         dict(within_block="sequential", backend="xla")),
        ("sk1024_jacobi", sk,
         dict(replicas=2048, sweeps=1024, iters=2),
         dict(within_block="jacobi", backend="xla")),
    ]
    for name, prob, run_kw, eng_kw in grid:
        try:
            rec = measure_engine(prob, **run_kw, **eng_kw)
        except Exception as ex:                       # noqa: BLE001
            rec = {"error": f"{type(ex).__name__}: {ex}"[:300]}
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    with open("results/bench_honest_pallas.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
