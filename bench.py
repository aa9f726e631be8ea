"""Benchmark: spin-flip attempt throughput on the flagship sweep kernel.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.json): spin-flip attempts/sec/chip on a 1000-spin
SK instance (padded to 1024). `vs_baseline` is the speedup over the
reference's Python kernel (/root/reference/NMC/nmc.py:71-89, O(N*nnz) per
sweep), measured live on this host for a short calibration run and scaled
to the same attempt count.

Flags: --quick (smaller run), --sweep (print a table of configs to stderr).
"""

import argparse
import json
import sys
import time

import numpy as np


def measure_tpu(n=1024, replicas=256, sweeps=64, iters=3, block_size=128,
                within_block="sequential", precision="default"):
    import jax
    import jax.numpy as jnp

    from nmc_tpu.io.generators import random_sk
    from nmc_tpu.ops.engine import SweepEngine
    from nmc_tpu.ops.sweeps import run_sweeps

    prob = random_sk(n, seed=0).normalized()[0]
    engine = SweepEngine(prob, block_size=block_size,
                         within_block=within_block, precision=precision)
    key = jax.random.PRNGKey(0)
    m = engine.init_states(key, replicas)
    phi = engine.fields(m)
    beta_sweep = jnp.full((sweeps,), 2.0, jnp.float32)
    ones = jnp.ones((), jnp.float32)
    mask = jnp.broadcast_to(engine.active, (replicas, engine.n_pad))

    def step(m, phi, key):
        res = run_sweeps(engine.J_rows, engine.J_diag, engine.h, m, phi, key,
                         beta_sweep, ones, mask, num_sweeps=sweeps,
                         within_block=engine.within_block,
                         block_order="fixed", record_m=False,
                         precision=precision)
        return res.m, res.phi

    # warmup/compile
    m, phi = step(m, phi, jax.random.PRNGKey(1))
    jax.block_until_ready(m)

    # median of k repeated timed captures: the shared axon tunnel has
    # 2x run-to-run variance (docs/BENCHMARKS.md), a single capture is
    # not a stable artifact (VERDICT round 1 #9)
    samples = []
    for rep in range(5):
        t0 = time.perf_counter()
        for i in range(iters):
            m, phi = step(m, phi, jax.random.PRNGKey(2 + rep * iters + i))
        jax.block_until_ready(m)
        samples.append(time.perf_counter() - t0)
    dt = float(np.median(samples))
    attempts = iters * sweeps * replicas * prob.n  # true spins only
    return attempts / dt, dt


def measure_reference_python(n=1024, budget_s=2.0):
    """Reference kernel cost: per-spin full J@m + h (nmc.py:86), measured
    on this host and converted to attempts/sec."""
    rng = np.random.RandomState(0)
    J = rng.randn(n, n)
    J = 0.5 * (J + J.T)
    np.fill_diagonal(J, 0.0)
    J /= np.abs(J).max()
    from scipy.sparse import csr_matrix
    Js = csr_matrix(J)
    h = np.zeros((n, 1))
    m = np.sign(rng.rand(n, 1) - 0.5)
    beta = 2.0
    t0 = time.perf_counter()
    attempts = 0
    while time.perf_counter() - t0 < budget_s:
        for kk in rng.permutation(n)[:256]:  # partial sweep is enough
            x = Js.dot(m) + h
            m[kk] = np.sign(np.tanh(beta * x[kk]) - 2 * rng.rand() + 1)
            attempts += 1
    dt = time.perf_counter() - t0
    return attempts / dt


def _tpu_watchdog(timeout_s=240):
    """Fail FAST (exit 1, stderr note) when the axon tunnel is
    unreachable, instead of hanging the caller: backend init blocks
    indefinitely during tunnel outages (observed 2026-08-17, ~2 h), and
    a hung bench stalls whoever invoked it. Probe in a subprocess so the
    hang cannot leak into this process."""
    import subprocess
    probe = ("import sys; sys.path.insert(0, '/root/repo')\n"
             "import jax, jax.numpy as jnp\n"
             "(jnp.ones((128, 128)) @ jnp.ones((128, 128)))"
             ".block_until_ready()\n")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           timeout=timeout_s, capture_output=True)
        if r.returncode == 0:
            return
        msg = r.stderr.decode(errors="replace")[-500:]
    except subprocess.TimeoutExpired:
        msg = f"device probe hung > {timeout_s}s (tunnel outage?)"
    print(f"bench: TPU unreachable — {msg}", file=sys.stderr)
    sys.exit(1)


def main():
    from nmc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    _tpu_watchdog()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--replicas", type=int, default=None)
    ap.add_argument("--n", type=int, default=1024)
    args = ap.parse_args()

    if args.quick:
        n, reps, sweeps, iters = 256, 64, 16, 2
    else:
        n, reps, sweeps, iters = args.n, args.replicas or 512, 64, 20

    if args.sweep:
        for r in (64, 128, 256, 512):
            for wb in ("sequential", "jacobi"):
                fps, dt = measure_tpu(n=n, replicas=r, sweeps=sweeps,
                                      iters=2, within_block=wb)
                print(f"  n={n} R={r} {wb}: {fps:.3e} attempts/s ({dt:.2f}s)",
                      file=sys.stderr)

    flips_per_sec, _ = measure_tpu(n=n, replicas=reps, sweeps=sweeps,
                                   iters=iters)
    ref_rate = measure_reference_python(n=n, budget_s=1.5)

    print(json.dumps({
        "metric": "spin_flip_attempts_per_sec_per_chip",
        "value": float(f"{flips_per_sec:.4g}"),
        "unit": "attempts/s",
        "vs_baseline": float(f"{flips_per_sec / ref_rate:.4g}"),
    }))


if __name__ == "__main__":
    main()
