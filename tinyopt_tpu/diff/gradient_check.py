"""Gradient checking against finite differences.

Counterpart of the reference's gradient checker (reference:
include/tinyopt/diff/gradient_check.h:51-220): validates a user-supplied
(or AD-produced) gradient/Hessian against manifold-aware central
differences of the cost.  Used by the test suite on every loss and by
users debugging manual accumulation functions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from .. import manifold as mf
from .auto import flatten_residuals, residual_jacobian
from .num_diff import Method, estimate_num_jac


class GradientCheck(NamedTuple):
    ok: bool
    max_grad_diff: float
    max_h_diff: float


def check_gradient(x, acc: Callable, eps: float = 1e-5,
                   method: Method = Method.CENTRAL) -> GradientCheck:
    """Compare the gradient produced by ``acc`` with a numeric gradient.

    ``acc(x) -> (cost, grad[, H])`` is a manual accumulation function (the
    functional form of the reference's in-place acc contract).  The numeric
    gradient differences the *cost* with step ``eps/10``, mirroring
    ``diff::CheckGradient`` (reference: gradient_check.h:51-103).
    """
    spec = mf.tangent_spec(x)
    out = acc(x)
    if not isinstance(out, (tuple, list)) or len(out) < 2:
        raise ValueError("acc must return (cost, grad[, H])")
    g_user = jnp.ravel(jnp.asarray(out[1])).astype(spec.dtype)

    def cost_only(y):
        from .auto import _as_cost
        o = acc(y)
        # The acc contract allows the cost slot to be a scalar, a
        # (cost, n) pair, or a Cost object (diff/auto._as_cost).
        return jnp.reshape(
            _as_cost(o[0] if isinstance(o, (tuple, list)) else o).cost, ())

    g_num = jnp.ravel(
        estimate_num_jac(cost_only, x, method, eps / 10.0, spec))
    gd = float(jnp.max(jnp.abs(g_user - g_num))) if spec.dims else 0.0
    return GradientCheck(ok=gd < eps, max_grad_diff=gd, max_h_diff=0.0)


def check_residuals_gradient(x, residual_fn: Callable, eps: float = 1e-5,
                             method: Method = Method.CENTRAL,
                             check_hessian: bool = True) -> GradientCheck:
    """Validate AD grad = JᵀR and H = JᵀJ of a residual function numerically.

    Wraps the residuals in ‖·‖² and checks the gradient against central
    differences, and (optionally) H against the numeric JᵀJ — the same two
    comparisons as ``diff::CheckResidualsGradient`` (reference:
    gradient_check.h:144-220).
    """
    spec = mf.tangent_spec(x)
    r, J = residual_jacobian(residual_fn, x, spec)
    g_ad = J.T @ r
    H_ad = J.T @ J

    def cost_only(y):
        ry = flatten_residuals(residual_fn(y)).astype(spec.dtype)
        return jnp.vdot(ry, ry)

    g_num = jnp.ravel(
        estimate_num_jac(cost_only, x, method, eps / 10.0, spec))
    # cost = ‖r‖² so its gradient is 2·JᵀR
    gd = float(jnp.max(jnp.abs(2.0 * g_ad - g_num))) if spec.dims else 0.0

    hd = 0.0
    if check_hessian and spec.dims:
        J_num = estimate_num_jac(residual_fn, x, method, eps / 10.0, spec)
        H_num = J_num.T @ J_num
        hd = float(jnp.max(jnp.abs(H_ad - H_num)))
    return GradientCheck(ok=(gd < eps) and (hd < eps),
                         max_grad_diff=gd, max_h_diff=hd)
