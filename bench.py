"""Benchmark: spin-flip attempt throughput on the flagship sweep kernel.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.json north star): spin-flip attempts/sec/chip
on the graph-colored Pallas sweep kernel — measured on a SHIPPED
instance (chimera512 001.txt) with replicas batched along the lane
dimension. `vs_baseline` is the speedup over the reference's Python
kernel (/root/reference/NMC/nmc.py:71-89, per-spin full J@m + h),
measured live on this host on the SAME instance and scaled to the same
attempt count.

Timing discipline: every capture ends in a scalar device->host fetch.
jax.block_until_ready through the axon tunnel has been observed
returning before the computation completes (results/bench_tune.json
recorded capture times implying >370 TFLOP/s on a v5e — above bf16
peak), which inflated the r1/r2 artifacts (1.14e11 / 7.6e10) by 10-100x;
the forced-sync rate of the same XLA SK config is 1.1e9. The honest
north-star numbers live in results/bench_honest*.json and
docs/BENCHMARKS.md.

Flags: --quick (smaller run), --sweep (stderr table of configs).
"""

import argparse
import json
import sys
import time

import numpy as np

CHIMERA512 = ("/root/reference/NMC/examples/Chimera_droplet_instances/"
              "chimera512_spinglass_power/001.txt")


def _flagship_problem(n_fallback=512):
    import os

    from nmc_tpu.io.loaders import load_chimera
    from nmc_tpu.io.generators import chimera_graph

    if os.path.exists(CHIMERA512):
        return load_chimera(CHIMERA512).normalized()[0]
    return chimera_graph(8, 8, seed=0).normalized()[0]


def measure_tpu(replicas=2048, sweeps=1024, iters=4, reps=5,
                backend="pallas", precision="highest"):
    import jax
    import jax.numpy as jnp

    from nmc_tpu.ops.engine import SweepEngine

    prob = _flagship_problem()
    if jax.default_backend() == "cpu" and backend == "pallas":
        backend = "xla"          # CPU smoke path; the artifact runs on TPU
    engine = SweepEngine(prob, use_coloring=True, backend=backend,
                         precision=precision)
    m = engine.init_states(jax.random.PRNGKey(0), replicas)

    def step(m, k):
        return engine.run(m, k, num_sweeps=sweeps, beta=2.0,
                          blocked_input=True, blocked_output=True).m

    m = step(m, jax.random.PRNGKey(1))
    float(jnp.sum(m))            # full sync after warmup/compile
    samples = []
    for rep in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            m = step(m, jax.random.PRNGKey(2 + rep * iters + i))
        sync = float(jnp.sum(m))   # forced transfer = real completion
        samples.append(time.perf_counter() - t0)
        assert sync == sync
    dt = float(np.median(samples))
    attempts = iters * sweeps * replicas * prob.n   # true spins only
    return attempts / dt, dt


def measure_reference_python(budget_s=2.0):
    """Reference kernel cost on the SAME flagship instance: per-spin
    full J@m + h (nmc.py:86), converted to attempts/sec."""
    from scipy.sparse import csr_matrix

    prob = _flagship_problem()
    n = prob.n
    rng = np.random.RandomState(0)
    Js = csr_matrix(np.asarray(prob.J))
    h = np.asarray(prob.h).reshape(n, 1)
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
    indefinitely during tunnel outages (observed 2026-08-17, ~16 h), and
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


def _quiesce_chains(wait_s=240,
                    pid_files=("/tmp/nmc_chain.pids", "/tmp/seg5.pid",
                               "/tmp/seg6.pid"),
                    stop_file="/tmp/nmc_chain_stop"):
    """Claim an idle chip before capturing: the resumable campaign
    chains (scripts/run_campaign_r3_seg*_chain.sh) poll
    /tmp/nmc_chain_stop every ~5 s, kill their in-flight item (their
    runners checkpoint per chunk, so at most one chunk re-runs on
    resume) and exit. The round-2 bench artifact was depressed 34% by
    exactly this contention (VERDICT r2 weak #2). No-op when no chain
    pid is alive."""
    import os

    pids = []
    for f in pid_files:
        try:
            with open(f) as fh:
                pids += [int(tok) for tok in fh.read().split()]
        except (OSError, ValueError):
            pass

    def alive(p):
        # /proc state rather than kill(p, 0): an exited-but-unreaped
        # (zombie) chain must count as gone
        try:
            with open(f"/proc/{p}/stat") as fh:
                return fh.read().rsplit(")", 1)[1].split()[0] != "Z"
        except OSError:
            return False

    live = sorted({p for p in pids if alive(p)})
    if not live:
        return
    with open(stop_file, "w") as fh:
        fh.write("bench capture in progress\n")
    print(f"bench: stopping campaign chains {live} for an idle-chip "
          f"capture", file=sys.stderr)
    t0 = time.time()
    while time.time() - t0 < wait_s and any(alive(p) for p in live):
        time.sleep(3)
    # chains are gone (or unresponsive — proceed anyway, bounded wait);
    # leave the stop file so a straggler item still exits at its next
    # poll rather than contending mid-capture
    time.sleep(5)


def main():
    # Parse args BEFORE touching the device or the chain stop file, so
    # `bench.py --help` / a mistyped flag cannot kill in-flight campaign
    # chains (ADVICE r3).
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--replicas", type=int, default=None)
    args = ap.parse_args()

    from nmc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    _tpu_watchdog()
    _quiesce_chains()

    if args.quick:
        reps, sweeps, iters = 256, 64, 2
    else:
        reps, sweeps, iters = args.replicas or 2048, 1024, 4

    if args.sweep:
        for r in (512, 1024, 2048):
            for be in ("pallas", "xla"):
                fps, dt = measure_tpu(replicas=r, sweeps=256, iters=2,
                                      backend=be)
                print(f"  R={r} {be}: {fps:.3e} attempts/s ({dt:.2f}s)",
                      file=sys.stderr)

    flips_per_sec, _ = measure_tpu(replicas=reps, sweeps=sweeps,
                                   iters=iters)
    ref_rate = measure_reference_python(budget_s=1.5)

    print(json.dumps({
        "metric": "spin_flip_attempts_per_sec_per_chip",
        "value": float(f"{flips_per_sec:.4g}"),
        "unit": "attempts/s",
        "vs_baseline": float(f"{flips_per_sec / ref_rate:.4g}"),
    }))

    # Capture done: clear the stop file so relaunched chains (the
    # documented resume path) are not permanently blocked by a stale
    # stop (ADVICE r3). register_chain also clears it defensively.
    import os
    try:
        os.remove("/tmp/nmc_chain_stop")
    except OSError:
        pass


if __name__ == "__main__":
    main()
