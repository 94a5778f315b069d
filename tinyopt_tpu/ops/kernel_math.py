"""Mosaic-safe math for code traced inside Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) lowers the elementwise transcendentals
``sin/cos/exp/log/sqrt/log1p/tanh`` but has no rules for the inverse trig
family (``atan/atan2/asin/acos``), ``sinh/cosh``, ``erf``, ``expm1`` or
``cbrt``.  Library code that must run both in the fused whole-solve kernel
(ops/pallas_solver.py) and on the normal XLA path (where the exact
primitives exist and are faster/preciser) calls the functions here: outside
a kernel trace they are the jnp primitives verbatim; inside one (detected
via a trace-time context flag set by the kernel builder) they switch to
polynomial implementations built only from Mosaic-lowerable ops.

The polynomial ``arctan`` is the Cephes ``atanf`` minimax scheme (octant
range reduction + degree-9 polynomial, max error ~1e-7 — below the f32
round-off of the surrounding quaternion algebra).  Used by the SO3/SE3
``log`` maps (manifolds/so3.py), which is what pose-graph and prior
residuals trace into the kernel.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_IN_KERNEL = contextvars.ContextVar("tinyopt_in_pallas_kernel",
                                    default=False)


@contextlib.contextmanager
def kernel_trace():
    """Mark the enclosed trace as targeting a Pallas TPU kernel."""
    token = _IN_KERNEL.set(True)
    try:
        yield
    finally:
        _IN_KERNEL.reset(token)


def in_kernel_trace() -> bool:
    return _IN_KERNEL.get()


def _poly_atan(z):
    """arctan for any real z via octant reduction (Cephes atanf scheme)."""
    dtype = z.dtype
    sign = jnp.where(z < 0, -1.0, 1.0).astype(dtype)
    x = jnp.abs(z)

    t3p8 = dtype.type(2.414213562373095)    # tan(3π/8)
    tp8 = dtype.type(0.4142135623730950)    # tan(π/8)
    big = x > t3p8
    mid = (~big) & (x > tp8)

    # Range-reduce to |y| <= tan(π/8); guard divisions in dead branches.
    y_big = 1.0 / jnp.where(big, x, 1.0)                  # atan = π/2 − atan(1/x)
    y_mid = (x - 1.0) / jnp.where(mid, x + 1.0, 1.0)      # atan = π/4 + atan(…)
    y = jnp.where(big, y_big, jnp.where(mid, y_mid, x))

    y2 = y * y
    p = dtype.type(8.05374449538e-2)
    p = p * y2 - dtype.type(1.38776856032e-1)
    p = p * y2 + dtype.type(1.99777106478e-1)
    p = p * y2 - dtype.type(3.33329491539e-1)
    r = p * y2 * y + y

    half_pi = dtype.type(1.5707963267948966)
    quarter_pi = dtype.type(0.7853981633974483)
    r = jnp.where(big, half_pi - r, jnp.where(mid, quarter_pi + r, r))
    return sign * r


def _poly_atan2(y, x):
    """Full-quadrant arctan2 from ``_poly_atan`` (select-only branches)."""
    y = jnp.asarray(y)
    x = jnp.asarray(x, y.dtype)
    dtype = y.dtype
    pi = dtype.type(3.141592653589793)
    half_pi = dtype.type(1.5707963267948966)

    base = _poly_atan(y / jnp.where(x == 0, 1.0, x))
    quad = jnp.where(
        x > 0, base,
        jnp.where(x < 0,
                  jnp.where(y < 0, base - pi, base + pi),
                  jnp.where(y < 0, -half_pi, half_pi)))
    # atan2(0, 0) = 0 like the IEEE convention for +0, +0
    return jnp.where((x == 0) & (y == 0), dtype.type(0.0), quad)


def arctan2(y, x):
    """``jnp.arctan2`` on the XLA path; polynomial inside kernel traces."""
    if _IN_KERNEL.get():
        return _poly_atan2(y, x)
    return jnp.arctan2(y, x)


def arctan(z):
    """``jnp.arctan`` on the XLA path; polynomial inside kernel traces."""
    if _IN_KERNEL.get():
        return _poly_atan(jnp.asarray(z))
    return jnp.arctan(z)
