from .mesh import distributed_init, make_mesh
from .sharded import ShardedExclusiveKL, multistart_optimize
from .fsdp import FSDPFullRankELBO

__all__ = ["make_mesh", "distributed_init", "ShardedExclusiveKL",
           "multistart_optimize", "FSDPFullRankELBO"]
