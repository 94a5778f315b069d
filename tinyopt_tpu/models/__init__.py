from . import problems
from .se3_refinement import make_se3_refinement

__all__ = ["problems", "make_se3_refinement"]
