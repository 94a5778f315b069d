from . import problems
from .icp import icp, make_icp_problem, nearest_neighbors
from .se3_refinement import make_se3_refinement

__all__ = ["problems", "make_se3_refinement", "icp", "make_icp_problem",
           "nearest_neighbors"]
