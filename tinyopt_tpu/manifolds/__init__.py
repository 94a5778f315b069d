from .so3 import SO3
from .se3 import SE3

__all__ = ["SO3", "SE3"]
