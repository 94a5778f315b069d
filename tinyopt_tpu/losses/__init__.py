from . import norms, robust_norms

__all__ = ["norms", "robust_norms"]
