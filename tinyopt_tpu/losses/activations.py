"""Activation losses with diagonal Jacobians.

Counterpart of the reference's activation family (reference:
include/tinyopt/losses/activations.h:15-31, helpers.h:13-100).  Plain
functions under AD; ``*_with_jac`` variants return the (value, Jacobian)
pair the reference exports for manual chain-ruling — all Jacobians are
diagonal (elementwise activations).
"""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid(x):
    """1/(1+e⁻ˣ) (activations.h:15-17)."""
    return 1.0 / (1.0 + jnp.exp(-jnp.asarray(x)))


def sigmoid_with_jac(x):
    s = sigmoid(x)
    return s, jnp.diag(jnp.ravel(s * (1.0 - s)))


def tanh(x):
    """(eˣ−e⁻ˣ)/(eˣ+e⁻ˣ) (activations.h:20-22)."""
    return jnp.tanh(jnp.asarray(x))


def tanh_with_jac(x):
    t = tanh(x)
    return t, jnp.diag(jnp.ravel(1.0 - t * t))


def relu(x):
    """max(0, x) (activations.h:25-27)."""
    x = jnp.asarray(x)
    return jnp.maximum(x, 0.0)


def relu_with_jac(x):
    x = jnp.asarray(x)
    return jnp.maximum(x, 0.0), jnp.diag(jnp.ravel(jnp.where(x > 0, 1.0, 0.0)))


def leaky_relu(x, a: float = 0.01):
    """x>0: x, else a·x (activations.h:30-31)."""
    x = jnp.asarray(x)
    return jnp.where(x > 0, x, a * x)


def leaky_relu_with_jac(x, a: float = 0.01):
    x = jnp.asarray(x)
    return (jnp.where(x > 0, x, a * x),
            jnp.diag(jnp.ravel(jnp.where(x > 0, 1.0, a))))
