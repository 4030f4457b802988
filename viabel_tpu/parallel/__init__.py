from .mesh import distributed_init, make_mesh
from .sharded import ShardedExclusiveKL, multistart_optimize, shard_mc_objective
from .multistart import multistart_faso
from .raabbvi import multistart_raabbvi
from .fsdp import FSDPFullRankELBO

__all__ = ["make_mesh", "distributed_init", "ShardedExclusiveKL",
           "shard_mc_objective", "multistart_optimize", "multistart_faso",
           "multistart_raabbvi", "FSDPFullRankELBO"]
