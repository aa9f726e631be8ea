"""Mirror of the reference's APT -> NPT pipeline
(/root/reference/NPT/apt_preprocessor.py:234 then npt.py:720):
build the beta schedule, then run replica exchange with NMC on the
coldest 5 replicas."""
import jax
import numpy as np

from nmc_tpu import APTConfig, NPTConfig, apt_preprocess, npt_run
from nmc_tpu.io.generators import random_sk
from nmc_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()
problem = random_sk(1000, seed=0)

apt = apt_preprocess(problem, APTConfig(num_sweeps_MCMC=1000,
                                        num_sweeps_read=1000, num_rng=100,
                                        beta_start=0.5, alpha=1.25,
                                        beta_max=30.0),
                     jax.random.PRNGKey(0))
beta_list = np.asarray(apt.beta)
print(f"APT schedule: {len(beta_list)} rungs, beta "
      f"{beta_list[0]:.2f}..{beta_list[-1]:.2f}")

R = len(beta_list)
doNMC = [False] * (R - 5) + [True] * 5
res = npt_run(problem, beta_list, doNMC,
              NPTConfig(num_sweeps_MCMC=10_000, num_sweeps_read=100,
                        num_swap_attempts=10,
                        num_swapping_pairs=round(0.3 * R),
                        global_beta=1 / 0.366838 * 5, lambda_start=3.0,
                        tolerance=1e-8, max_iterations=300,
                        record_last_round_m=False),
              jax.random.PRNGKey(1))
print(f"min energy: {res.min_energy:.4f} "
      f"(raw {res.min_energy * res.norm_factor:.2f}), "
      f"swap acceptance {res.acceptance_rate:.2f}")
