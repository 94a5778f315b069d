from .linalg import solve_psd, inv_cov, damp_diagonal

__all__ = ["solve_psd", "inv_cov", "damp_diagonal"]
