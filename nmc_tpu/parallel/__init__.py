"""Multi-chip parallelism: replica sharding, instance ensembles, label swaps.

The reference's only parallel backend is a single-node ProcessPoolExecutor
(/root/reference/NPT/npt.py:616, apt_preprocessor.py:160). Here:

  * on-chip batching (replicas/chains/sub-replicas) is the vmap/batch axis
    of the sweep kernel — no module needed;
  * replica parallelism across chips: parallel/sharded_pt.ShardedNPT
    (shard_map over a 'replica' mesh axis, beta-label swaps, all_gather of
    R scalars per round);
  * instance-ensemble parallelism across chips: parallel/ensemble.EnsemblePT
    (instances sharded, zero cross-shard communication);
  * spin(J)-axis sharding when N outgrows one chip's HBM:
    parallel/spin_sharded.SpinShardedSweeper (column-sharded J + phi,
    per-block psum of dm only);
  * swap machinery shared by all: parallel/swaps.py.
"""

from . import distributed
from .ensemble import EnsembleConfig, EnsemblePT, EnsembleState
from .ensemble_icm import EnsembleICM, EnsembleICMConfig, EnsembleICMState
from .ensemble_nmc import EnsembleNMC, EnsembleNMCState
from .spin_sharded import SpinShardedConfig, SpinShardedState, SpinShardedSweeper
from .sharded_pt import RoundMetrics, ShardedNPT, ShardedNPTConfig, ShardedPTState
from .swaps import metropolis_label_swap, select_pairs_device

__all__ = [
    "ShardedNPT", "ShardedNPTConfig", "ShardedPTState", "RoundMetrics",
    "EnsemblePT", "EnsembleConfig", "EnsembleState",
    "EnsembleNMC", "EnsembleNMCState",
    "EnsembleICM", "EnsembleICMConfig", "EnsembleICMState",
    "metropolis_label_swap", "select_pairs_device",
    "SpinShardedSweeper", "SpinShardedConfig", "SpinShardedState",
    "distributed",
]
