"""Classification losses (reference: include/tinyopt/losses/classif.h:17-86).

``softmax``/``safe_softmax`` with the full dense Jacobian
``J[i,j] = sᵢ(δᵢⱼ − sⱼ)`` exported by the ``*_with_jac`` variants.
"""

from __future__ import annotations

import jax.numpy as jnp


def softmax(x):
    """eˣⁱ / Σeˣ (classif.h:17-49) — un-shifted, can overflow for large x."""
    e = jnp.exp(jnp.ravel(jnp.asarray(x)))
    return e / jnp.sum(e)


def safe_softmax(x):
    """Max-subtracted softmax (classif.h:53-86)."""
    x = jnp.ravel(jnp.asarray(x))
    e = jnp.exp(x - jnp.max(x))
    return e / jnp.sum(e)


def _softmax_jac(s):
    return jnp.diag(s) - jnp.outer(s, s)


def softmax_with_jac(x):
    s = softmax(x)
    return s, _softmax_jac(s)


def safe_softmax_with_jac(x):
    s = safe_softmax(x)
    return s, _softmax_jac(s)
