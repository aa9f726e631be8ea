"""Reconcile bench.py vs bench_honest2.py on the same chip, same process.

The round-3 tail captured 2.95e10/3.40e10 attempts/s via bench.py
(results/bench_r3_tail_{a,b}.json) but 1.52e10 for the nominally
identical c512_pallas_r2048 config via bench_honest2.py — both
forced-sync, both median-of-5, both precision="highest". This runs the
two code paths interleaved A/B/A/B in ONE process on an idle chip so
any environmental drift hits both arms equally.

Writes results/bench_reconcile.json.
"""
import json
import sys

sys.path.insert(0, "/root/repo")


if __name__ == "__main__":
    from nmc_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()
    sys.path.insert(0, "/root/repo/scripts")
    import importlib.util as _il
    spec = _il.spec_from_file_location("bh2", "/root/repo/scripts/bench_honest2.py")
    bh2 = _il.module_from_spec(spec)
    spec.loader.exec_module(bh2)

    spec2 = _il.spec_from_file_location("bm", "/root/repo/bench.py")
    bm = _il.module_from_spec(spec2)
    spec2.loader.exec_module(bm)

    from nmc_tpu.io.loaders import load_chimera
    c512_raw = load_chimera(
        "/root/reference/NMC/examples/Chimera_droplet_instances/"
        "chimera512_spinglass_power/001.txt")
    c512_norm = c512_raw.normalized()[0]

    out = {}
    for rnd in range(2):
        # arm A: bench.py's own measure_tpu (normalized problem)
        fps, dt = bm.measure_tpu(replicas=2048, sweeps=1024, iters=4)
        out[f"benchpy_{rnd}"] = {"attempts_per_s": fps, "capture_s": dt}
        print(f"benchpy_{rnd}: {fps:.3e} ({dt:.3f}s)", flush=True)
        # arm B: bench_honest2's measure_engine (raw problem)
        rec = bh2.measure_engine(c512_raw, replicas=2048, sweeps=1024,
                                 iters=4, use_coloring=True,
                                 backend="pallas")
        out[f"honest2_raw_{rnd}"] = rec
        print(f"honest2_raw_{rnd}: {rec['attempts_per_s']:.3e} "
              f"({rec['capture_s']:.3f}s)", flush=True)
        # arm C: measure_engine on the NORMALIZED problem (bench.py's prep)
        rec = bh2.measure_engine(c512_norm, replicas=2048, sweeps=1024,
                                 iters=4, use_coloring=True,
                                 backend="pallas")
        out[f"honest2_norm_{rnd}"] = rec
        print(f"honest2_norm_{rnd}: {rec['attempts_per_s']:.3e} "
              f"({rec['capture_s']:.3f}s)", flush=True)
    with open("results/bench_reconcile.json", "w") as f:
        json.dump(out, f, indent=1)
