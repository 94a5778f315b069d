"""Distances between parameter/feature vectors.

Counterpart of ``tinyopt::distances`` (reference:
include/tinyopt/distances.h:17-106).  ``*_with_jac`` variants return
``(d, Ja, Jb)`` with ``Jb = −Ja`` for the difference-based distances and
the analytic pair for cosine.
"""

from __future__ import annotations

import jax.numpy as jnp

from .norms import (l1, l1_with_jac, l2, l2_with_jac, linf, linf_with_jac)
from .mahalanobis import (maha_norm as _maha_norm,
                          maha_norm_with_jac as _maha_norm_with_jac)


def euclidean(a, b):
    """‖a − b‖ (distances.h:17-28)."""
    return l2(jnp.asarray(a) - jnp.asarray(b))


def euclidean_with_jac(a, b):
    d, J = l2_with_jac(jnp.asarray(a) - jnp.asarray(b))
    return d, J, -J


def manhattan(a, b):
    """Σ|aᵢ − bᵢ| (distances.h:36-47)."""
    return l1(jnp.asarray(a) - jnp.asarray(b))


def manhattan_with_jac(a, b):
    d, J = l1_with_jac(jnp.asarray(a) - jnp.asarray(b))
    return d, J, -J


def linf_dist(a, b):
    """max|aᵢ − bᵢ| (distances.h:55-66)."""
    return linf(jnp.asarray(a) - jnp.asarray(b))


def linf_dist_with_jac(a, b):
    d, J = linf_with_jac(jnp.asarray(a) - jnp.asarray(b))
    return d, J, -J


def cosine(a, b, eps: float | None = None):
    """Cosine similarity a·b/(‖a‖‖b‖), 0 for near-zero inputs
    (distances.h:69-94)."""
    a = jnp.ravel(jnp.asarray(a))
    b = jnp.ravel(jnp.asarray(b))
    if eps is None:
        eps = float(jnp.finfo(a.dtype).eps)
    an = jnp.linalg.norm(a)
    bn = jnp.linalg.norm(b)
    ok = an * bn >= eps
    denom = jnp.where(ok, an * bn, 1.0)
    return jnp.where(ok, jnp.vdot(a, b) / denom, 0.0)


def cosine_with_jac(a, b, eps: float | None = None):
    a = jnp.ravel(jnp.asarray(a))
    b = jnp.ravel(jnp.asarray(b))
    if eps is None:
        eps = float(jnp.finfo(a.dtype).eps)
    an = jnp.linalg.norm(a)
    bn = jnp.linalg.norm(b)
    ok = an * bn >= eps
    an_s = jnp.where(ok, an, 1.0)
    bn_s = jnp.where(ok, bn, 1.0)
    ab = jnp.vdot(a, b)
    d = jnp.where(ok, ab / (an_s * bn_s), 0.0)
    Ja = jnp.where(ok, b / (an_s * bn_s) - ab * a / (an_s ** 3 * bn_s), 0.0)
    Jb = jnp.where(ok, a / (an_s * bn_s) - ab * b / (an_s * bn_s ** 3), 0.0)
    return d, Ja[None, :], Jb[None, :]


def maha_norm(a, b, cov_or_var):
    """‖a − b‖_Σ (distances.h:97-106)."""
    return _maha_norm(jnp.asarray(a) - jnp.asarray(b), cov_or_var)


def maha_norm_with_jac(a, b, cov_or_var):
    d, J = _maha_norm_with_jac(jnp.asarray(a) - jnp.asarray(b), cov_or_var)
    return d, J, -J
