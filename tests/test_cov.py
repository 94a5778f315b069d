"""Covariance recovery.

Mirror of reference tests/cov.cpp:20-170: after optimizing a whitened
Gaussian prior, the posterior covariance (H⁻¹ of the final Hessian) must
equal the prior covariance — in all formulations: manual acc vs AD, ×
stdev-whitening vs full-covariance whitening vs information-matrix
whitening.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.losses import mahalanobis


Y = jnp.array([1.0, -2.0, 0.5])
STDEVS = jnp.array([0.5, 1.5, 2.0])
COV = jnp.array([[2.0, 0.3, 0.1],
                 [0.3, 1.5, 0.2],
                 [0.1, 0.2, 1.0]])


def _solve_and_cov(fn, mode="auto"):
    x, out = to.optimize(jnp.zeros(3), fn, mode=mode)
    assert bool(out.succeeded()) and bool(out.converged())
    assert out.final_hessian is not None
    return x, out.covariance()


class TestStdevWhitening:
    def test_ad_path(self):
        x, C = _solve_and_cov(lambda x: (x - Y) / STDEVS)
        np.testing.assert_allclose(np.sqrt(np.diag(np.asarray(C))),
                                   np.asarray(STDEVS), atol=1e-7)

    def test_manual_acc_path(self):
        def acc(x):
            r = (x - Y) / STDEVS
            J = jnp.diag(1.0 / STDEVS)
            return (jnp.vdot(r, r), 3), J.T @ r, J.T @ J

        x, C = _solve_and_cov(acc, mode="acc")
        np.testing.assert_allclose(np.sqrt(np.diag(np.asarray(C))),
                                   np.asarray(STDEVS), atol=1e-7)


class TestFullCovWhitening:
    def test_ad_path(self):
        x, C = _solve_and_cov(
            lambda x: mahalanobis.maha_whitened(x - Y, COV))
        np.testing.assert_allclose(np.asarray(C), np.asarray(COV),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(x), np.asarray(Y), atol=1e-6)

    def test_manual_acc_path(self):
        def acc(x):
            r, J = mahalanobis.maha_whitened_with_jac(x - Y, COV)
            return (jnp.vdot(r, r), 3), J.T @ r, J.T @ J

        x, C = _solve_and_cov(acc, mode="acc")
        np.testing.assert_allclose(np.asarray(C), np.asarray(COV),
                                   atol=1e-5)


class TestInfoMatrixWhitening:
    def test_ad_path(self):
        """Upper info factor U with UᵀU = Σ⁻¹ → posterior == Σ."""
        inv_cov = jnp.linalg.inv(COV)
        # UᵀU = Σ⁻¹ with U upper: U = chol(Σ⁻¹) transposed appropriately
        L = jnp.linalg.cholesky(inv_cov)          # L Lᵀ = Σ⁻¹
        U = L.T                                   # UᵀU = L Lᵀ = Σ⁻¹
        x, C = _solve_and_cov(
            lambda x: mahalanobis.maha_whitened_info_u(x - Y, U))
        np.testing.assert_allclose(np.asarray(C), np.asarray(COV),
                                   atol=1e-5)


class TestRescaledCovariance:
    """The overdetermined-rescale branch — the sixth formulation of
    reference tests/cov.cpp; formula pinned to output.h:80-93:
    cov × final_cost²/(num_residuals − dims) when n > dims."""

    def test_overdetermined_rescale(self):
        # 2 stacked noisy priors: n=6 residuals > d=3 dims, and the two
        # targets disagree so final_cost > 0 at the minimizer.
        Y2 = Y + jnp.array([0.2, -0.1, 0.3])

        def fn(x):
            return jnp.concatenate([(x - Y) / STDEVS, (x - Y2) / STDEVS])

        x, out = to.optimize(jnp.zeros(3), fn)
        assert bool(out.converged())
        C = out.covariance()
        Cr = out.covariance(rescaled=True)
        c = float(out.final_cost.cost)
        n = int(out.final_cost.num_residuals)
        assert n == 6 and c > 0
        np.testing.assert_allclose(np.asarray(Cr),
                                   np.asarray(C) * (c * c / (n - 3)),
                                   rtol=1e-12)
        # un-rescaled posterior of the stacked prior is Σ/2 (two
        # independent measurements): σ_post = σ/√2
        np.testing.assert_allclose(np.sqrt(np.diag(np.asarray(C))),
                                   np.asarray(STDEVS) / np.sqrt(2.0),
                                   atol=1e-7)

    def test_determined_system_is_noop(self):
        """n == dims: rescaled must return the plain covariance
        (output.h:87 guards on num_residuals > cols)."""
        x, out = to.optimize(jnp.zeros(3), lambda x: (x - Y) / STDEVS)
        C = out.covariance()
        Cr = out.covariance(rescaled=True)
        np.testing.assert_array_equal(np.asarray(C), np.asarray(Cr))


class TestMaxStdDev:
    def test_matches_covariance(self):
        from tinyopt_tpu.ops.linalg import max_std_dev
        x, out = to.optimize(jnp.zeros(3), lambda x: (x - Y) / STDEVS)
        assert float(max_std_dev(out.final_hessian)) == pytest.approx(
            float(jnp.max(STDEVS)), rel=1e-6)
