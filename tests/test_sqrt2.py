"""End-to-end convergence: sqrt(2), mirroring reference tests/sqrt2.cpp.

Covers: manual-acc path (sqrt2.cpp:31-56), AD scalar-residual path
(sqrt2.cpp:59-71 with cost downscaling), AD 2-residual path
(sqrt2.cpp:73-93), GN (sqrt2.cpp:95-105), across 3 start points
(sqrt2.cpp:106-113).
"""

import math

import jax.numpy as jnp
import pytest

import tinyopt_tpu as to

SQRT2 = math.sqrt(2.0)
X0S = [1.0, -0.3, 3.2]


def options():
    return to.Options(max_iters=20, max_consec_failures=0)


@pytest.mark.parametrize("x0", X0S)
def test_sqrt2_manual_acc(x0):
    def acc(x):
        res = x[0] * x[0] - 2.0
        J = 2.0 * x[0]
        grad = jnp.array([J * res])
        H = jnp.array([[J * J]])
        return res * res, grad, H

    x, out = to.optimize(jnp.array([x0]), acc, options())
    assert bool(out.succeeded())
    assert bool(out.converged())
    assert abs(float(jnp.abs(x[0])) - SQRT2) < 1e-5


@pytest.mark.parametrize("x0", X0S)
def test_sqrt2_manual_acc_upper_only(x0):
    """hessian.H_is_full=False accepts an upper-triangle-only H
    (reference sqrt2.cpp:31-51 manual acc + gn.h:139-145 symmetrization,
    the recommended fast path of reference docs/API.md:170).

    Uses a COUPLED 2-D problem (x0² − 2, x0·x1 − 2, x1 − 1) whose JᵀJ has
    a nonzero off-diagonal, so a missing lower triangle produces wrong
    steps — the full-H and upper-only runs must agree exactly."""
    def system(x):
        r = jnp.array([x[0] * x[0] - 2.0, x[0] * x[1] - 2.0, x[1] - 1.0])
        J = jnp.array([[2.0 * x[0], 0.0],
                       [x[1], x[0]],
                       [0.0, 1.0]])
        return r, J

    def acc_full(x):
        r, J = system(x)
        return (jnp.sum(r * r), 3), J.T @ r, J.T @ J

    def acc_upper(x):
        r, J = system(x)
        H = J.T @ J
        # Poison the strict lower triangle: correct results prove the
        # solver rebuilt it from the upper part rather than using it.
        return (jnp.sum(r * r), 3), J.T @ r, jnp.triu(H) - 7.0 * jnp.tril(H, -1)

    import dataclasses
    opts_full = options()
    opts_upper = opts_full.replace(
        hessian=dataclasses.replace(opts_full.hessian, H_is_full=False))
    xf, outf = to.optimize(jnp.array([x0, 1.0]), acc_full, opts_full,
                           mode="acc")
    xu, outu = to.optimize(jnp.array([x0, 1.0]), acc_upper, opts_upper,
                           mode="acc")
    assert bool(outu.succeeded())
    assert jnp.array_equal(xf, xu), (xf, xu)
    assert int(outf.num_iters) == int(outu.num_iters)


@pytest.mark.parametrize("x0", X0S)
def test_sqrt2_ad_scalar(x0):
    opts = options().replace(
        cost=to.CostScalingOptions(use_squared_norm=True, downscale_by_2=True))
    x, out = to.optimize(jnp.array(x0), lambda x: x * x - 2.0, opts)
    assert bool(out.succeeded())
    assert bool(out.converged())
    assert abs(float(jnp.abs(x)) - SQRT2) < 1e-5


@pytest.mark.parametrize("x0", X0S)
def test_sqrt2_ad_two_residuals(x0):
    def residuals(x):
        r = x * x - 2.0
        return jnp.stack([r, 0.1 * r])

    x, out = to.optimize(jnp.array(x0), residuals, options())
    assert bool(out.succeeded())
    assert bool(out.converged())
    assert abs(float(jnp.abs(x)) - SQRT2) < 1e-5


@pytest.mark.parametrize("x0", [x for x in X0S if x > 0])
def test_sqrt2_gn(x0):
    opts = options().replace(solver_type=to.GaussNewton)
    x, out = to.optimize(jnp.array(x0), lambda x: x * x - 2.0, opts)
    assert bool(out.succeeded())
    assert bool(out.converged())
    assert abs(float(jnp.abs(x)) - SQRT2) < 1e-5


def test_sqrt2_convergence_fast():
    """README.md:89-97: LM converges on sqrt2 in ~5 iterations."""
    x, out = to.optimize(jnp.array(1.0), lambda x: x * x - 2.0, options())
    assert int(out.num_iters) <= 8
    assert float(out.final_cost.cost) < 1e-10
