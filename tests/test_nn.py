"""NN / chain-rule integration test.

Mirror of reference tests/nn.cpp:62-296: perceptron batch forward, manual
chain-rule Jacobian vs AD equality, one GD training step manual-vs-AD, and
full NLLS training to convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.diff import residual_jacobian
from tinyopt_tpu.models import nn


def _make_data(n=16, in_dim=3, out_dim=2, seed=1):
    rng = np.random.default_rng(seed)
    true_params = {
        "W": jnp.asarray(rng.uniform(-1, 1, (out_dim, in_dim))),
        "b": jnp.asarray(rng.uniform(-0.5, 0.5, out_dim)),
    }
    x = jnp.asarray(rng.uniform(-1, 1, (n, in_dim)))
    y = nn.forward(true_params, x)
    return nn.PerceptronData(x, y), true_params


class TestManualVsAD:
    def test_jacobian_equality(self):
        """Manual chain-rule J == AD J (nn.cpp:153-248)."""
        data, _ = _make_data()
        params = nn.init_perceptron(3, 2, jnp.float64, seed=2)
        J_manual = nn.manual_jacobian(params, data)
        _, J_ad = residual_jacobian(lambda p: nn.residuals(p, data), params)
        np.testing.assert_allclose(np.asarray(J_manual), np.asarray(J_ad),
                                   atol=1e-10)

    def test_gd_step_manual_vs_ad(self):
        """One GD step from a manual acc equals one from AD
        (nn.cpp:277-296)."""
        data, _ = _make_data()
        params = nn.init_perceptron(3, 2, jnp.float64, seed=3)
        opts = to.Options(solver_type=to.GradientDescent, max_iters=1,
                          min_error=0, min_rerr_dec=0, min_step_norm2=0,
                          min_grad_norm2=0, gd=to.GDOptions(lr=0.1))

        def manual_acc(p):
            r = nn.residuals(p, data)
            J = nn.manual_jacobian(p, data)
            return jnp.vdot(r, r), 2.0 * (J.T @ r)

        p1, out1 = to.optimize(params, lambda p: nn.mse_cost(p, data),
                               opts, mode="cost")
        p2, out2 = to.optimize(params, manual_acc, opts, mode="acc")
        np.testing.assert_allclose(np.asarray(p1["W"]), np.asarray(p2["W"]),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(p1["b"]), np.asarray(p2["b"]),
                                   atol=1e-12)


class TestTraining:
    def test_nlls_training_recovers_function(self):
        """LM on the residuals drives the fit error to ~0."""
        data, true_params = _make_data(n=32)
        params = nn.init_perceptron(3, 2, jnp.float64, seed=4)
        p_opt, out = to.optimize(params,
                                 lambda p: nn.residuals(p, data),
                                 to.Options(max_iters=100))
        assert bool(out.succeeded())
        pred = nn.forward(p_opt, data.inputs)
        assert float(jnp.max(jnp.abs(pred - data.targets))) < 1e-4

    def test_gd_training_decreases_cost(self):
        data, _ = _make_data()
        params = nn.init_perceptron(3, 2, jnp.float64, seed=5)
        p_opt, out = to.optimize(
            params, lambda p: nn.mse_cost(p, data),
            to.Options(solver_type=to.GradientDescent, max_iters=500,
                       gd=to.GDOptions(lr=0.5)))
        assert out.errs_list[-1] < out.errs_list[0] * 0.1
