"""Sparse / large-scale solves: block-diagonal and matrix-free GN-CG.

The reference handles large problems with a general ``SparseMatrix``
Hessian factored by ``SimplicialLDLT`` (reference: solvers/gn.h:63-74,
math.h:266-277, tests/sparse.cpp:19-85) and admits it is "not fast for
large systems yet" (reference README.md:30).  A sequential sparse
factorization is the wrong shape for a TPU; this module provides the two
TPU-native formulations that cover the same problems:

* **Block-diagonal** (``block_optimize``): independent parameter blocks —
  the structure of the reference's sparse tests/benchmarks — solved with
  one *batched* dense Cholesky over the (nb, bs, bs) block array on the
  MXU.
* **Matrix-free GN-CG** (``matfree_optimize``): never materializes J or
  JᵀJ.  The Gauss-Newton matvec v ↦ Jᵀ(J v) is two AD passes (one jvp +
  one vjp) through the residual function, and (JᵀJ + λI) dx = −g is solved
  by conjugate gradients.  Damping is additive (λI, Marquardt) rather than
  the reference's multiplicative diag scaling, because diag(JᵀJ) is not
  available without d extra passes.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import manifold as mf
from .cost import Cost
from .diff.auto import flatten_residuals, value_and_jacfwd
from .optimizers.loop import optimize_from_acc
from .options import Options, SolverType
from .ops.block import BlockDiag


# --------------------------------------------------------------------------
# Block-diagonal path
# --------------------------------------------------------------------------

def block_nlls_system(block_fn: Callable, x0: jax.Array, data=None):
    """(accumulate, evaluate, n_res) for independent parameter blocks.

    ``x0`` has shape (nb, bs); ``block_fn(x_block[, data_block])`` returns
    the residuals of one block.  H is assembled as a :class:`BlockDiag`
    and solved blockwise — the full (nb·bs)² matrix never exists.
    """
    nb, bs = x0.shape
    dtype = x0.dtype

    if data is None:
        fn = lambda xb, _: block_fn(xb)
        data_axis = None
        data_arg = jnp.zeros((nb,), dtype)
    else:
        fn = block_fn
        data_axis = 0
        data_arg = data

    r_shape = jax.eval_shape(
        lambda xb, db: flatten_residuals(fn(xb, db)),
        jax.ShapeDtypeStruct((bs,), dtype),
        jax.tree_util.tree_map(lambda a: a[0], data_arg))
    n_res = nb * math.prod(r_shape.shape)

    def one(xb, db):
        r, J = value_and_jacfwd(
            lambda v: flatten_residuals(fn(v, db)).astype(dtype), xb)
        return (jnp.matmul(J.T, J, preferred_element_type=dtype),
                J.T @ r, jnp.vdot(r, r))

    def accumulate(x):
        Hs, gs, cs = jax.vmap(one)(x, data_arg)
        return BlockDiag(Hs), gs.reshape(-1), Cost.make(jnp.sum(cs), n_res)

    def evaluate(x):
        def c_one(xb, db):
            r = flatten_residuals(fn(xb, db)).astype(dtype)
            return jnp.vdot(r, r)
        return Cost.make(jnp.sum(jax.vmap(c_one)(x, data_arg)), n_res)

    return accumulate, evaluate, n_res


def block_optimize(x0: jax.Array, block_fn: Callable,
                   options: Options | None = None, *, data=None,
                   jit: bool = True):
    """Solve an NLLS problem with independent (block-diagonal) parameter
    blocks.  Returns ``(x_opt, Output)``; ``Output.final_hessian`` is a
    :class:`BlockDiag` and ``Output.covariance()`` is blockwise."""
    options = options or Options()
    x0 = jnp.asarray(x0)
    spec = mf.tangent_spec(x0)
    acc, ev, n_res = block_nlls_system(block_fn, x0, data)

    def solve(x):
        return optimize_from_acc(x, acc, ev, options, spec)

    return (jax.jit(solve) if jit else solve)(x0)


# --------------------------------------------------------------------------
# Matrix-free GN-CG path
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LinPoint:
    """Hessian representation for the matrix-free path: the linearization
    point itself.  The GN matvec is re-derived from it on demand, so the
    ``Rebuild(false)`` semantics (H frozen at the last full build while
    probing) carry over exactly — the carried LinPoint only changes on a
    rebuild."""

    x: Any


def matfree_system(residual_fn: Callable, x0, spec: mf.TangentSpec,
                   cg_iters: int, cg_tol: float):
    """(accumulate, evaluate, n_res, propose) closures for GN-CG.

    accumulate computes the gradient with ONE reverse-mode pass (the
    reference's forward-mode Jets need `dims` passes — reverse mode is the
    right tool when J itself is never needed).
    """
    n_res = int(sum(
        math.prod(l.shape) for l in
        jax.tree_util.tree_leaves(jax.eval_shape(residual_fn, x0))))

    def r_of_delta(delta, x):
        return flatten_residuals(
            residual_fn(mf.retract(x, delta, spec))).astype(spec.dtype)

    def accumulate(x):
        delta0 = mf.zero_tangent(x, spec)
        r, vjp_fn = jax.vjp(lambda d: r_of_delta(d, x), delta0)
        g = vjp_fn(r)[0]
        return LinPoint(x), g, Cost.make(jnp.vdot(r, r), n_res)

    def evaluate(x):
        r = flatten_residuals(residual_fn(x)).astype(spec.dtype)
        return Cost.make(jnp.vdot(r, r), n_res)

    def propose(H: LinPoint, g, lam, opts):
        delta0 = mf.zero_tangent(H.x, spec)
        _, jvp_fn = jax.linearize(lambda d: r_of_delta(d, H.x), delta0)
        _, vjp_fn = jax.vjp(lambda d: r_of_delta(d, H.x), delta0)
        if opts.solver_type == SolverType.LEVENBERG_MARQUARDT:
            # Scale-aware additive damping: λ · (gᵀ JᵀJ g / gᵀg) · I.  The
            # Rayleigh quotient along g estimates the curvature magnitude
            # (one extra matvec), standing in for the reference's
            # multiplicative diag(JᵀJ) scaling which is unavailable
            # without materializing the diagonal.
            g2 = jnp.vdot(g, g)
            Jg = jvp_fn(g)
            ray = jnp.where(g2 > 0, jnp.vdot(Jg, Jg) / jnp.where(g2 > 0, g2, 1.0),
                            jnp.ones((), g.dtype))
            add_lam = lam * jnp.maximum(ray, jnp.finfo(g.dtype).tiny)
        else:
            add_lam = jnp.zeros_like(lam)

        def matvec(v):
            return vjp_fn(jvp_fn(v))[0] + add_lam * v

        dx, _ = jax.scipy.sparse.linalg.cg(
            matvec, -g, maxiter=cg_iters, tol=cg_tol)
        ok = jnp.all(jnp.isfinite(dx))
        return dx, ok

    return accumulate, evaluate, n_res, propose


def matfree_optimize(x0, residual_fn: Callable,
                     options: Options | None = None, *,
                     cg_iters: int = 0, cg_tol: float = 1e-10,
                     jit: bool = True):
    """Matrix-free Gauss-Newton/LM with conjugate-gradient inner solves.

    Neither J nor JᵀJ is ever materialized — suitable for very large
    tangent dimensions.  ``cg_iters=0`` defaults to the tangent dimension
    (exact CG in exact arithmetic).  ``Output.final_hessian`` is None.
    """
    options = options or Options()
    if options.solver_type == SolverType.GRADIENT_DESCENT:
        raise ValueError(
            "matfree_optimize is a Gauss-Newton/LM method; use "
            "to.optimize with GradientDescent for first-order solves")
    x0 = mf.as_pytree(x0)
    spec = mf.tangent_spec(x0)
    if cg_iters <= 0:
        cg_iters = spec.dims
    opts = options.replace(
        hessian=dataclasses.replace(options.hessian, save_last=False))
    acc, ev, n_res, propose = matfree_system(
        residual_fn, x0, spec, cg_iters, cg_tol)

    def solve(x):
        return optimize_from_acc(x, acc, ev, opts, spec, propose=propose)

    return (jax.jit(solve) if jit else solve)(x0)
