"""Multi-chip replica-sharded parallel tempering (one chip per R/n_dev
replicas; swap rounds fused into single dispatches)."""
import jax
import numpy as np

from nmc_tpu.io.generators import random_sk
from nmc_tpu.parallel import ShardedNPT, ShardedNPTConfig
from nmc_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()
problem = random_sk(1024, seed=0).normalized()[0]
R = 64
beta_list = np.geomspace(0.3, 4.0, R)
pt = ShardedNPT(problem, beta_list, [False] * R,
                ShardedNPTConfig(sweeps_per_phase=64, num_cycles=1,
                                 num_swapping_pairs=16, global_beta=3.0,
                                 precision="default"))
state = pt.init_state(jax.random.PRNGKey(0))
state, metrics = pt.run_scanned(state, 20)
e = np.asarray(metrics.slot_energies)
print(f"best energy: {e.min():.2f} over {e.shape[0]} fused rounds")
