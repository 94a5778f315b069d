from .mesh import make_mesh, local_mesh
from .batched import batched_optimize, batched_solver
from .sharded import make_block_system, sharded_optimize

__all__ = [
    "make_mesh", "local_mesh",
    "batched_optimize", "batched_solver",
    "make_block_system", "sharded_optimize",
]
