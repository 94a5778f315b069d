"""Step proposal for GN / LM / GD.

The "linear-system layer" of the framework: given the accumulated gradient
``g`` (= JᵀR) and Hessian approximation ``H`` (= JᵀJ), propose a step
``dx``.  Functional counterpart of ``SolverGN::Solve`` / ``SolverGD::Solve``
(reference: include/tinyopt/solvers/gn.h:150-171, gd.h:131-134).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..options import SolverType
from ..ops.block import BlockDiag
from ..ops.linalg import damp_diagonal, solve_psd
from ..ops.pallas_cg import make_cg_solver
from ..ops.sparse_sym import SparseSym


@functools.lru_cache(maxsize=None)
def _cg_solver(iters: int):
    return make_cg_solver(iters)


def propose_step(H, g, lam, opts):
    """Propose dx for the current (H, g, λ). Returns (dx, ok).

    * GD:    dx = -lr · g, always succeeds.
    * GN/LM: solve (H ⊕ λ·diag) dx = -g via Cholesky (λ = 0 for GN);
             failure (non-PSD) reported through ``ok`` for λ-escalation.

    ``H`` may be a dense (d, d) array or a :class:`BlockDiag` — the
    block-sparse path solves all blocks with one batched Cholesky.
    """
    if opts.solver_type == SolverType.GRADIENT_DESCENT:
        dx = -g.dtype.type(opts.gd.lr) * g
        return dx, jnp.ones((), bool)
    is_lm = opts.solver_type == SolverType.LEVENBERG_MARQUARDT
    if isinstance(H, BlockDiag):
        Hd = H.damp(lam) if is_lm else H
        return Hd.solve(-g, use_cholesky=opts.hessian.use_ldlt)
    if isinstance(H, SparseSym):
        # General sparse normal equations (the reference's SimplicialLDLT
        # path, gn.h:154-156) -> Jacobi-preconditioned CG on TPU.
        Hd = H.damp(lam) if is_lm else H
        return Hd.solve(-g, cg_iters=opts.hessian.cg_iters)
    Hd = damp_diagonal(H, lam) if is_lm else H
    # "fused" = whole-solve Pallas kernel when batched (ops/pallas_solver);
    # outside that path it degrades to the identical-iterates CG solve.
    if opts.hessian.solver in ("cg", "fused"):
        iters = opts.hessian.cg_iters or g.shape[-1]
        dx = _cg_solver(iters)(Hd, -g)
        return dx, jnp.all(jnp.isfinite(dx))
    dx, ok = solve_psd(Hd, -g, use_cholesky=opts.hessian.use_ldlt)
    return dx, ok
