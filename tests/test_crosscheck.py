"""Cross-check against an independent solver (scipy).

The analogue of the reference's Ceres parity test (reference:
tests/ceres.cpp:50-70 — same problem solved by tinyopt and by
ceres::AutoDiffCostFunction, solutions compared): here the independent
implementation is scipy.optimize.least_squares (trust-region reflective /
LM), which shares no code with this framework.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import least_squares

import tinyopt_tpu as to
from tinyopt_tpu.models.problems import (beale_residuals, make_circle,
                                         rosenbrock_residuals)


def _scipy_solve(fn, x0, method="lm"):
    f = lambda x: np.asarray(fn(jnp.asarray(x)), float)
    return least_squares(f, np.asarray(x0, float), method=method)


class TestScipyParity:
    @pytest.mark.parametrize("fn,x0", [
        (rosenbrock_residuals, [-1.2, 1.0]),
        (beale_residuals, [1.0, 1.0]),
    ])
    def test_same_optimum(self, fn, x0):
        ours, out = to.optimize(jnp.asarray(x0), fn,
                                to.Options(max_iters=300,
                                           max_consec_failures=0))
        ref = _scipy_solve(fn, x0)
        assert bool(out.succeeded())
        np.testing.assert_allclose(np.asarray(ours), ref.x, atol=1e-5)

    def test_circle_fit_parity(self):
        residuals, x0 = make_circle(n=16, noise=1e-3, seed=5)
        # Reference options for this problem (circle.cpp:59: λ₀=1e1,
        # "start closer to a gradient descent").
        ours, out = to.optimize(x0, residuals,
                                to.Options(lm=to.LMOptions(damping_init=1e1)))
        ref = _scipy_solve(residuals, x0)
        # Same cost basin and same fitted circle (sign of r is arbitrary)
        ours_n = np.asarray(ours).copy()
        ours_n[2] = abs(ours_n[2])
        ref_n = ref.x.copy()
        ref_n[2] = abs(ref_n[2])
        np.testing.assert_allclose(ours_n, ref_n, atol=1e-6)
        assert float(out.final_cost.cost) == pytest.approx(
            2.0 * ref.cost, rel=1e-6)  # scipy cost = ½‖r‖²

    def test_overdetermined_least_squares_parity(self):
        rng = np.random.default_rng(11)
        A = jnp.asarray(rng.normal(size=(20, 4)))
        b = jnp.asarray(rng.normal(size=20))
        fn = lambda x: A @ x - b
        ours, out = to.optimize(jnp.zeros(4), fn)
        ref = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-8)
