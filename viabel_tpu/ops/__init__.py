from .chol import chol_sample_matmul, set_pallas_enabled, pallas_enabled
from .trsm import blocked_solve_triangular

__all__ = ["chol_sample_matmul", "set_pallas_enabled", "pallas_enabled",
           "blocked_solve_triangular"]
