from .chol import chol_sample_matmul, set_pallas_enabled, pallas_enabled

__all__ = ["chol_sample_matmul", "set_pallas_enabled", "pallas_enabled"]
