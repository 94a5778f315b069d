"""Norms (reference: include/tinyopt/losses/norms.h:19-153).

In the reference every loss exports an analytic Jacobian for chain-ruling;
under JAX, AD handles that, so the losses are plain jittable functions.
Analytic-Jacobian variants (``*_with_jac``) are still provided for the
gradient-checker tests and manual-acc users.
"""

from __future__ import annotations

import jax.numpy as jnp


def squared_l2(x, add_scale: bool = False):
    """‖x‖²; with add_scale, returns (loss, 2) mirroring norms.h:19-49."""
    x = jnp.ravel(x)
    l = jnp.vdot(x, x)
    return (l, 2.0) if add_scale else l


def l2(x, eps: float = 1e-12):
    """‖x‖, exact in VALUE with an ε-guarded gradient at 0 (norms.h:52-81
    returns the exact norm and guards only the Jacobian; adding ε inside
    the sqrt would bias small norms — e.g. ‖x‖ = 1e-7 by 10×, exactly the
    near-convergence regime).  Double-where keeps the AD tangent finite
    at 0."""
    x = jnp.ravel(x)
    n2 = jnp.vdot(x, x)
    pos = n2 > eps
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, n2, 1.0)),
                     n2 / jnp.sqrt(jnp.asarray(eps, n2.dtype)))


def l1(x):
    """Σ|xᵢ| (norms.h:84-114)."""
    return jnp.sum(jnp.abs(jnp.ravel(x)))


def linf(x):
    """max|xᵢ| (norms.h:117-153)."""
    return jnp.max(jnp.abs(jnp.ravel(x)))


def squared_l2_with_jac(x):
    x = jnp.ravel(x)
    return jnp.vdot(x, x), 2.0 * x[None, :]


def l2_with_jac(x, eps: float = 1e-12):
    """Exact ‖x‖ with the reference's ε-guarded Jacobian xᵀ/max(‖x‖, ε)
    (norms.h:52-81)."""
    x = jnp.ravel(x)
    n = l2(x, eps)
    return n, (x / jnp.maximum(n, jnp.asarray(eps, n.dtype)))[None, :]


def l1_with_jac(x):
    x = jnp.ravel(x)
    return jnp.sum(jnp.abs(x)), jnp.sign(x)[None, :]


def linf_with_jac(x):
    x = jnp.ravel(x)
    i = jnp.argmax(jnp.abs(x))
    j = jnp.zeros_like(x).at[i].set(jnp.sign(x[i]))
    return jnp.abs(x[i]), j[None, :]
