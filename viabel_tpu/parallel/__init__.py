from .mesh import make_mesh
from .sharded import ShardedExclusiveKL, multistart_optimize
from .fsdp import FSDPFullRankELBO

__all__ = ["make_mesh", "ShardedExclusiveKL", "multistart_optimize",
           "FSDPFullRankELBO"]
