"""Differentiable solves: implicit differentiation of the optimum.

A capability with no reference counterpart but idiomatic for a JAX-native
optimizer (cf. jaxopt / Optimistix; PAPERS.md "One-step differentiation of
iterative algorithms"): make ``θ ↦ x*(θ) = argmin_x ‖r(x, θ)‖²``
differentiable WITHOUT backpropagating through the LM iterations.

At the optimum the stationarity condition ``g(x*, θ) = J(x*,θ)ᵀ r(x*,θ) = 0``
holds; the implicit function theorem gives

    dx*/dθ = −H⁻¹ · ∂g/∂θ,     H = ∂g/∂x ≈ JᵀJ  (Gauss-Newton)

so the VJP of a cotangent ``v`` is ``−(∂g/∂θ)ᵀ H⁻¹ v`` — one linear solve
plus one reverse-mode pass, independent of iteration count.  This enables
bilevel optimization (learning robust-loss thresholds, calibrating sensor
models, training networks through geometric solvers) at constant memory.

Limitations: parameters ``x`` must be Euclidean pytrees (no registered
manifold leaves — the cotangent would need the tangent-space pullback);
``θ`` is any pytree of arrays.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import manifold as mf
from .diff.auto import flatten_residuals, residual_jacobian
from .optimize import build_solver
from .options import Options


def implicit_solver(residual_fn: Callable, options: Options | None = None,
                    *, x_example=None, theta_example=None):
    """Build a differentiable solve ``(theta, x0) -> x_opt``.

    ``residual_fn(x, theta)`` returns the residual pytree.  The returned
    function is jit/vmap-friendly and differentiable in ``theta`` via the
    implicit function theorem (gradients do NOT flow through the LM
    iterations, and x0 is treated as non-differentiable).
    """
    options = options or Options()
    if x_example is None:
        raise ValueError("x_example is required")
    x_example = mf.as_pytree(x_example)
    spec = mf.tangent_spec(x_example)
    # Reject manifold leaves (Euclidean-only; see module docstring).
    leaves, _ = jax.tree_util.tree_flatten(
        x_example, is_leaf=mf._is_manifold_leaf)
    if any(mf.manifold_for(l) is not None for l in leaves):
        raise NotImplementedError(
            "implicit_solver supports Euclidean parameter pytrees only")

    def _grad_fn(x, theta):
        """g(x, θ) = JᵀR on the tangent space."""
        def r_of_delta(delta):
            return flatten_residuals(
                residual_fn(mf.retract(x, delta, spec), theta)
            ).astype(spec.dtype)

        delta0 = mf.zero_tangent(x, spec)
        r, vjp_fn = jax.vjp(r_of_delta, delta0)
        return vjp_fn(r)[0]

    @jax.custom_vjp
    def solve(theta, x0):
        solver = build_solver(lambda x: residual_fn(x, theta), options,
                              "residuals", x0)
        x_opt, _ = solver(x0)
        return x_opt

    def fwd(theta, x0):
        x_opt = solve(theta, x0)
        return x_opt, (theta, x_opt)

    def bwd(res, v):
        theta, x_opt = res
        # Flatten the cotangent on x* into the tangent layout.
        v_flat = mf.flatten_values(v).astype(spec.dtype)
        # H = JᵀJ at the optimum (Gauss-Newton ∂g/∂x).
        _, J = residual_jacobian(lambda x: residual_fn(x, theta), x_opt,
                                 spec)
        H = jnp.matmul(J.T, J, preferred_element_type=spec.dtype)
        lam = jnp.linalg.solve(H, v_flat)
        # Rank-deficient H (over-parameterized / gauge-free inner
        # problems) makes the plain solve NaN; fall back to the
        # minimum-norm least-squares solution — the standard IFT
        # pseudo-inverse convention — only when needed (lax.cond keeps
        # the common path one O(d³) solve).
        lam = jax.lax.cond(
            jnp.all(jnp.isfinite(lam)),
            lambda l: l,
            lambda _: jnp.linalg.lstsq(H, v_flat)[0],
            lam)
        # θ-cotangent: −(∂g/∂θ)ᵀ λ via one reverse-mode pass through g.
        _, vjp_theta = jax.vjp(lambda th: _grad_fn(x_opt, th), theta)
        (theta_bar,) = vjp_theta(lam)
        neg = jax.tree_util.tree_map(lambda a: -a, theta_bar)
        zero_x0 = jax.tree_util.tree_map(jnp.zeros_like, x_opt)
        return neg, zero_x0

    solve.defvjp(fwd, bwd)
    return solve
