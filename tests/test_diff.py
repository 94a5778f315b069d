"""Diff-layer tests.

Mirror of the reference's tests/diff.cpp:19-60 (numerical differentiation)
and tests/check_gradient.cpp:18-47 (gradient checker), plus AD-vs-numdiff
agreement on manifold (SO3) parameters which the reference exercises through
Jet-through-user-struct tests (tests/userdef_params_jet.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu import diff
from tinyopt_tpu.manifolds import SO3


def _rosen(p):
    return jnp.stack([1.0 - p[0], 10.0 * (p[1] - p[0] * p[0])])


class TestNumEval:
    @pytest.mark.parametrize("method", [diff.Method.FORWARD,
                                        diff.Method.CENTRAL,
                                        diff.Method.FAST_CENTRAL])
    def test_matches_ad_jacobian(self, method):
        x = jnp.array([0.3, -1.2])
        r_num, J_num = diff.num_eval(_rosen, x, method)
        r_ad, J_ad = diff.residual_jacobian(_rosen, x)
        np.testing.assert_allclose(np.asarray(r_num), np.asarray(r_ad))
        tol = 1e-4 if method == diff.Method.FORWARD else 1e-6
        np.testing.assert_allclose(np.asarray(J_num), np.asarray(J_ad),
                                   atol=tol)

    def test_scalar_problem(self):
        f = lambda x: x * x - 2.0
        r, J = diff.num_eval(f, jnp.asarray(1.0))
        assert J.shape == (1, 1)
        np.testing.assert_allclose(float(J[0, 0]), 2.0, atol=1e-6)

    def test_manifold_tangent_jacobian(self):
        """FD through the SO3 retraction matches AD on the tangent space."""
        R = SO3.exp(jnp.array([0.2, -0.1, 0.3], jnp.float64))
        p = jnp.array([1.0, 2.0, 3.0], jnp.float64)

        def res(rot):
            return rot.apply(p)

        _, J_num = diff.num_eval(res, R)
        _, J_ad = diff.residual_jacobian(res, R)
        assert J_num.shape == (3, 3)
        np.testing.assert_allclose(np.asarray(J_num), np.asarray(J_ad),
                                   atol=1e-5)

    def test_jit_and_vmap_compatible(self):
        xs = jnp.stack([jnp.array([0.3, -1.2]), jnp.array([1.0, 1.0])])
        jac = jax.jit(jax.vmap(lambda x: diff.num_eval(_rosen, x)[1]))(xs)
        assert jac.shape == (2, 2, 2)


class TestNumDiffSolve:
    def test_numdiff_mode_converges(self):
        x, out = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0,
                             mode="numdiff")
        assert float(x) == pytest.approx(np.sqrt(2.0), abs=1e-5)
        assert out.num_diff_used
        assert bool(out.converged())

    def test_first_order_numdiff_system(self):
        spec = None
        acc, ev, n = diff.make_num_diff_system(
            _rosen, jnp.array([0.5, 0.5]), first_order=True)
        H, g, cost = acc(jnp.array([0.5, 0.5]))
        assert H is None and g.shape == (2,) and n == 2


class TestGradientCheck:
    def test_check_residuals_gradient_ok(self):
        res = diff.check_residuals_gradient(jnp.array([0.3, -1.2]), _rosen)
        assert res.ok, res

    def test_check_gradient_catches_wrong_grad(self):
        def bad_acc(x):
            c = jnp.sum(x * x)
            return c, 3.0 * x  # should be 2x

        res = diff.check_gradient(jnp.array([1.0, 2.0]), bad_acc)
        assert not res.ok
        assert res.max_grad_diff > 0.5

    def test_check_gradient_good_acc(self):
        def acc(x):
            return jnp.sum(x * x), 2.0 * x

        res = diff.check_gradient(jnp.array([1.0, -2.0]), acc)
        assert res.ok, res
