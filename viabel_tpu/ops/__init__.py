from .dispatch import pallas_enabled, set_pallas_enabled
from .ringstats import ring_group_stats
from .trsm import (blocked_solve_triangular, stl_transpose_solve,
                   vmem_solve_triangular)

__all__ = ["pallas_enabled", "set_pallas_enabled", "ring_group_stats",
           "blocked_solve_triangular", "stl_transpose_solve",
           "vmem_solve_triangular"]
