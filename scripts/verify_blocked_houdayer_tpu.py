"""Verify (real TPU): EnsembleICM with houdayer='blocked' solves shipped
ground-truth instances and matches houdayer='sparse' draw-for-draw."""
import sys
sys.path.insert(0, "/root/repo")

import json
import numpy as np
import jax

from nmc_tpu.evaluation import wishart_folder_instances
from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
from nmc_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

FOLDER = ("/root/reference/NPT/examples/wishart_small/"
          "wishart_planting_N_22_alpha_0.50")
rows = list(wishart_folder_instances(FOLDER, limit=2))
names = [r[0] for r in rows]
probs, factors, gs_norm = [], [], []
for _, p, gs_raw in rows:
    pn, f = p.normalized()
    probs.append(pn)
    factors.append(f)
    gs_norm.append(gs_raw / f)

beta = np.geomspace(0.3, 8.0, 8)
out = {"backend": jax.default_backend(), "instances": names}
states = {}
for mode in ("sparse", "blocked"):
    cfg = EnsembleICMConfig(sweeps_per_round=24, num_subreplicas=4,
                            num_swapping_pairs=2, use_coloring=True,
                            houdayer=mode)
    ens = EnsembleICM(probs, beta, cfg)
    if mode == "blocked":
        assert ens._houd_tiles is not None, "blocked tiles not built"
    st = ens.init_state(jax.random.PRNGKey(0))
    st = ens.run_scanned(st, 40)
    eb, mb = ens.best(st)
    states[mode] = st
    # f64 re-evaluation of the best STATES against the shipped raw
    # ground energies (what the campaign harness does — the f32 device
    # energy is only a tracker)
    e64 = [float(probs[i].energy(np.asarray(mb[i], np.float64)))
           * factors[i] for i in range(len(probs))]
    gs_raw = [gs_norm[i] * factors[i] for i in range(len(probs))]
    out[mode] = {
        "e_best_f32": [float(e) for e in eb],
        "e_best_f64_raw": e64,
        "gs_raw": gs_raw,
        "hits": [bool(e64[i] <= gs_raw[i] + 1e-6 * abs(gs_raw[i]))
                 for i in range(len(probs))],
        "icm_moves": int(np.asarray(st.icm_moves).sum()),
    }

a, b = states["sparse"], states["blocked"]
out["trajectory_parity"] = bool(
    np.array_equal(np.asarray(a.m), np.asarray(b.m))
    and np.array_equal(np.asarray(a.beta_to_slot),
                       np.asarray(b.beta_to_slot))
    and np.array_equal(np.asarray(a.e_best), np.asarray(b.e_best)))
print(json.dumps(out, indent=1))
assert out["trajectory_parity"], "blocked vs sparse trajectories diverge"
assert all(out["blocked"]["hits"]), out["blocked"]
assert out["blocked"]["icm_moves"] > 0
print("VERIFY-BLOCKED-HOUDAYER: OK")
