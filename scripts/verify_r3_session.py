"""Session verify: public-surface solve on real TPU + streamed-round-kernel
hardware parity (the code path changed by the wide-matmul phi update).

Run from the repo root (keeps /root/.axon_site on PYTHONPATH intact).
"""
import sys
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from nmc_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

print("platform:", jax.devices()[0].platform)

# --- 1) public-surface solve: wishart N=22 with shipped ground truth ------
from nmc_tpu import NPTConfig, npt_run
from nmc_tpu.evaluation import wishart_folder_instances

folder = ("/root/reference/NPT/examples/wishart_small/"
          "wishart_planting_N_22_alpha_0.50")
name, prob, gs_raw = next(iter(wishart_folder_instances(folder, limit=1)))
gs_norm = gs_raw / float(np.max(np.abs(prob.J)))
res = npt_run(prob, np.geomspace(0.3, 4.0, 12), [False] * 12,
              NPTConfig(num_sweeps_MCMC=20000, num_sweeps_read=20000,
                        num_swap_attempts=100, target_energy=gs_norm),
              jax.random.PRNGKey(0))
hit = res.min_energy <= gs_norm + 1e-6
print(f"npt_run {name}: hit_round={res.hit_round} "
      f"min_energy={res.min_energy:.6f} gs={gs_norm:.6f} hit={hit}")
assert hit, "wishart N=22 ground state not reached"

# --- 2) streamed round kernel on REAL TPU: energies match f64 re-eval -----
from nmc_tpu.core.problem import block_sparse_tiles, block_problem
from nmc_tpu.io.generators import ea_2d
from nmc_tpu.ops.round_pallas import pallas_ensemble_round_streamed
from nmc_tpu.ops.coloring import color_groups

prob2 = ea_2d(8, seed=5).normalized()[0]
groups = color_groups(np.asarray(prob2.J))
b = block_problem(prob2, block_size=128, groups=groups)
n_pad = b.n_pad
R = 8
ci, jt = block_sparse_tiles(b)
J_tiles = np.broadcast_to(jt, (2,) + jt.shape).copy()
h = np.broadcast_to(np.asarray(b.h), (2, n_pad)).copy()
act = np.asarray(b.active, np.float32)
rng = np.random.default_rng(5)
m0 = np.where(rng.random((2, R, n_pad)) < 0.5, -1.0, 1.0).astype(np.float32)
m0 = np.where(act.astype(bool), m0, 1.0)
cl = ((rng.random((2, R, n_pad)) < 0.3) & act.astype(bool))
dn = np.array([[False] * 5 + [True] * 3] * 2)
beta = np.broadcast_to(np.geomspace(0.4, 3.0, R), (2, R))
out = pallas_ensemble_round_streamed(
    ci, J_tiles, h, act, m0, cl, dn, beta, 11,
    num_cycles=2, sweeps_per_phase=5, block_size=b.block_size,
    interpret=False)
inv = np.asarray(b.inv_perm)
worst = 0.0
for i in range(2):
    for r in range(R):
        st = np.asarray(out.m[i, r])[inv]
        worst = max(worst, abs(float(out.e_carried[i, r])
                               - float(prob2.energy(st))))
assert worst < 1e-3, f"carried-energy drift {worst}"
pad = ~np.asarray(b.active)
if pad.any():
    np.testing.assert_array_equal(np.asarray(out.m)[..., pad], m0[..., pad])
moved = (np.asarray(out.m) != m0).any()
print(f"streamed round kernel on TPU: worst |e_carried - f64| = {worst:.2e}, "
      f"padding frozen, moved={bool(moved)}")
assert moved, "kernel made no moves (PRNG inactive?)"

# --- 3) sparse streaming SWEEP kernel on REAL TPU (wide-matmul phi) -------
from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_sparse

prob3 = ea_2d(16, seed=0)
groups3 = color_groups(np.asarray(prob3.J))
b3 = block_problem(prob3, block_size=128, groups=groups3)
J3 = np.asarray(b3.J_rows.reshape(b3.n_pad, b3.n_pad))
rng3 = np.random.default_rng(0)
m0_3 = np.where(rng3.random((8, b3.n_pad)) < 0.5, -1.0, 1.0).astype(np.float32)
m0_3[:, ~b3.active] = 1.0
phi0_3 = (m0_3 @ J3 + np.asarray(b3.h)).astype(np.float32)
ci3, jt3 = block_sparse_tiles(b3)
res3 = pallas_colored_sweeps_sparse(
    ci3, jt3, b3.h, m0_3, phi0_3, 42, np.full(10, 1.0, np.float32),
    np.ones(8, np.float32), b3.active, num_sweeps=10, block_size=128,
    r_tile=8)
m3 = np.asarray(res3.m)
assert set(np.unique(m3)) <= {-1.0, 1.0}
np.testing.assert_allclose(np.asarray(res3.phi),
                           m3 @ J3 + np.asarray(b3.h), atol=1e-3)
assert (m3 != m0_3).any(), "sparse sweep kernel made no moves"
print("sparse streaming sweep kernel on TPU: phi invariant holds, spins moved")

# --- 4) HBM-streamed dense sweep kernel on REAL TPU (aliased-init copy) ---
from nmc_tpu.ops.sweeps_pallas import pallas_colored_sweeps_streamed
import jax.numpy as jnp

res4 = pallas_colored_sweeps_streamed(
    jnp.asarray(b3.J_rows), b3.h, m0_3, phi0_3, 42,
    np.full(10, 1.0, np.float32), np.ones(8, np.float32), b3.active,
    num_sweeps=10, block_size=128, r_tile=8)
m4 = np.asarray(res4.m)
assert set(np.unique(m4)) <= {-1.0, 1.0}
np.testing.assert_allclose(np.asarray(res4.phi),
                           m4 @ J3 + np.asarray(b3.h), atol=1e-3)
assert (m4 != m0_3).any(), "streamed sweep kernel made no moves"
print("HBM-streamed sweep kernel on TPU: phi invariant holds, spins moved")
print("VERIFY OK")
