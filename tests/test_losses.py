"""Loss-library tests.

Mirror of the reference's loss test files (tests/{norms,robust_norms,
mahalanobis,activations,classif,distances}.cpp): every analytic
``*_with_jac`` Jacobian is compared against forward-mode AD of the plain
loss, exactly the reference's AD-cross-check pattern (e.g.
tests/classif.cpp:26-40).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinyopt_tpu import losses
from tinyopt_tpu.diff import value_and_jacfwd
from tinyopt_tpu.losses import (activations, classif, distances,
                                mahalanobis, norms, robust_norms)


def _ad_jac(f, x):
    return value_and_jacfwd(lambda v: jnp.atleast_1d(f(v)), x)[1]


X = jnp.array([0.3, -1.2, 2.1, 0.05])


class TestNorms:
    @pytest.mark.parametrize("fn,fn_jac", [
        (norms.squared_l2, norms.squared_l2_with_jac),
        (norms.l2, norms.l2_with_jac),
        (norms.l1, norms.l1_with_jac),
        (norms.linf, norms.linf_with_jac),
    ])
    def test_jac_matches_ad(self, fn, fn_jac):
        val, J = fn_jac(X)
        np.testing.assert_allclose(np.asarray(jnp.atleast_1d(fn(X))),
                                   np.atleast_1d(np.asarray(val)), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(J), np.asarray(_ad_jac(fn, X)),
                                   atol=1e-8)


class TestRobustNorms:
    FNS = [robust_norms.truncated, robust_norms.huber, robust_norms.tukey,
           robust_norms.arctan, robust_norms.cauchy,
           robust_norms.geman_mcclure, robust_norms.blake_zisserman]

    @pytest.mark.parametrize("fn", FNS[:-1])
    def test_inlier_identity(self, fn):
        """Well inside the threshold every loss ≈ n² and scale ≈ 1
        (robust_norms.h:17-27 contract; Blake-Zisserman is exempt — it
        carries a −log(1+e^{−th²}) offset by definition)."""
        n2 = jnp.asarray(1e-6)
        th2 = jnp.asarray(1.0)
        loss, scale = fn(n2, th2)
        assert float(loss) == pytest.approx(float(n2), rel=0.1)
        assert float(scale) == pytest.approx(1.0, abs=0.05)

    def test_blake_zisserman_formula(self):
        """loss = −log(e^{−n²} + e^{−th²}) (robust_norms.h:282-303)."""
        n2, th2 = 0.5, 4.0
        loss, scale = robust_norms.blake_zisserman(jnp.asarray(n2),
                                                   jnp.asarray(th2))
        expect = -np.log(np.exp(-n2) + np.exp(-th2))
        assert float(loss) == pytest.approx(expect, rel=1e-9)
        expect_scale = 1.0 / (np.exp(-th2) * np.exp(n2) + 1.0)
        assert float(scale) == pytest.approx(expect_scale, rel=1e-6)

    @pytest.mark.parametrize("fn", FNS)
    def test_outlier_bounded_influence(self, fn):
        """Far outside the threshold the IRLS scale collapses."""
        loss_in, scale_in = fn(jnp.asarray(0.5), jnp.asarray(1.0))
        loss_out, scale_out = fn(jnp.asarray(100.0), jnp.asarray(1.0))
        assert float(scale_out) < float(scale_in)
        assert float(scale_out) < 0.2

    def test_huber_matches_definition(self):
        th2 = 4.0
        n2 = 9.0  # outlier: loss = 2·th·n − th² = 2·2·3 − 4 = 8
        loss, scale = robust_norms.huber(jnp.asarray(n2), jnp.asarray(th2))
        assert float(loss) == pytest.approx(8.0)
        assert float(scale) == pytest.approx(2.0 / 3.0)

    @pytest.mark.parametrize("fn", FNS[:-1])
    def test_robust_whiten_consistency(self, fn):
        """‖robust_whiten(r)‖² == ρ(‖r‖²) exactly (sqrt-of-rho whitening)."""
        r = jnp.array([1.0, 2.0, -3.0])
        th2 = 2.0
        rw = robust_norms.robust_whiten(r, fn, th2)
        n2 = float(jnp.vdot(r, r))
        loss, _ = fn(jnp.asarray(n2), jnp.asarray(th2))
        assert float(jnp.vdot(rw, rw)) == pytest.approx(
            float(loss), rel=1e-6)

    def test_robust_whiten_finite_grad_at_rejection(self):
        """AD through whitening stays finite where Tukey rejects (scale=0)."""
        r = jnp.array([10.0, 0.0])
        J = jax.jacfwd(lambda v: robust_norms.robust_whiten(
            v, robust_norms.tukey, 1.0))(r)
        assert bool(jnp.all(jnp.isfinite(J)))


class TestMahalanobis:
    COV = jnp.array([[2.0, 0.3, 0.0, 0.0],
                     [0.3, 1.5, 0.1, 0.0],
                     [0.0, 0.1, 1.0, 0.2],
                     [0.0, 0.0, 0.2, 3.0]])

    def test_squared_norm_full_cov(self):
        n2 = mahalanobis.maha_squared_norm(X, self.COV)
        expect = float(X @ np.linalg.solve(np.asarray(self.COV),
                                           np.asarray(X)))
        assert float(n2) == pytest.approx(expect, rel=1e-10)

    def test_squared_norm_variance_vector(self):
        var = jnp.array([2.0, 1.5, 1.0, 3.0])
        n2 = mahalanobis.maha_squared_norm(X, var)
        assert float(n2) == pytest.approx(float(jnp.sum(X * X / var)))

    @pytest.mark.parametrize("cov", [COV, jnp.array([2.0, 1.5, 1.0, 3.0])])
    def test_jacs_match_ad(self, cov):
        _, J = mahalanobis.maha_squared_norm_with_jac(X, cov)
        J_ad = _ad_jac(lambda v: mahalanobis.maha_squared_norm(v, cov), X)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-8)
        _, Jn = mahalanobis.maha_norm_with_jac(X, cov)
        Jn_ad = _ad_jac(lambda v: mahalanobis.maha_norm(v, cov), X)
        np.testing.assert_allclose(np.asarray(Jn), np.asarray(Jn_ad),
                                   atol=1e-8)

    def test_whitened_norm_equals_maha_norm(self):
        """‖whiten(r)‖² == ‖r‖²_Σ in all three forms (tests/cov.cpp
        relies on this identity)."""
        n2 = float(mahalanobis.maha_squared_norm(X, self.COV))
        rw = mahalanobis.maha_whitened(X, self.COV)
        assert float(jnp.vdot(rw, rw)) == pytest.approx(n2, rel=1e-10)
        stdevs = jnp.array([1.5, 0.5, 2.0, 1.0])
        rw2 = mahalanobis.maha_whitened(X, stdevs)
        assert float(jnp.vdot(rw2, rw2)) == pytest.approx(
            float(jnp.sum(X * X / (stdevs * stdevs))), rel=1e-10)
        rw3 = mahalanobis.maha_whitened(X, jnp.asarray(2.0))
        assert float(jnp.vdot(rw3, rw3)) == pytest.approx(
            float(jnp.vdot(X, X)) / 4.0, rel=1e-10)

    def test_whitened_jac_matches_ad(self):
        _, J = mahalanobis.maha_whitened_with_jac(X, self.COV)
        J_ad = _ad_jac(lambda v: mahalanobis.maha_whitened(v, self.COV), X)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-8)

    def test_info_u_whitening(self):
        U = jnp.triu(jnp.array(np.random.default_rng(0).uniform(
            0.5, 1.5, (4, 4))))
        rw, J = mahalanobis.maha_whitened_info_u_with_jac(X, U)
        np.testing.assert_allclose(np.asarray(rw), np.asarray(U @ X),
                                   rtol=1e-12)
        J_ad = _ad_jac(
            lambda v: mahalanobis.maha_whitened_info_u(v, U), X)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-8)


class TestActivations:
    @pytest.mark.parametrize("fn,fn_jac", [
        (activations.sigmoid, activations.sigmoid_with_jac),
        (activations.tanh, activations.tanh_with_jac),
        (activations.relu, activations.relu_with_jac),
        (activations.leaky_relu, activations.leaky_relu_with_jac),
    ])
    def test_jac_matches_ad(self, fn, fn_jac):
        _, J = fn_jac(X)
        np.testing.assert_allclose(np.asarray(J), np.asarray(_ad_jac(fn, X)),
                                   atol=1e-8)


class TestClassif:
    def test_softmax_jac_matches_ad(self):
        """Softmax Jacobian sᵢ(δᵢⱼ−sⱼ) vs AD (tests/classif.cpp:26-40)."""
        for fn, fn_jac in [(classif.softmax, classif.softmax_with_jac),
                           (classif.safe_softmax,
                            classif.safe_softmax_with_jac)]:
            s, J = fn_jac(X)
            assert float(jnp.sum(s)) == pytest.approx(1.0, rel=1e-10)
            np.testing.assert_allclose(np.asarray(J),
                                       np.asarray(_ad_jac(fn, X)), atol=1e-8)

    def test_safe_softmax_large_inputs(self):
        big = jnp.array([1000.0, 1001.0, 999.0])
        s = classif.safe_softmax(big)
        assert bool(jnp.all(jnp.isfinite(s)))
        assert float(jnp.sum(s)) == pytest.approx(1.0)


class TestDistances:
    A = jnp.array([1.0, -2.0, 0.5])
    B = jnp.array([0.2, 1.1, -0.7])

    @pytest.mark.parametrize("fn,fn_jac", [
        (distances.euclidean, distances.euclidean_with_jac),
        (distances.manhattan, distances.manhattan_with_jac),
        (distances.linf_dist, distances.linf_dist_with_jac),
        (distances.cosine, distances.cosine_with_jac),
    ])
    def test_jacs_match_ad(self, fn, fn_jac):
        d, Ja, Jb = fn_jac(self.A, self.B)
        assert float(d) == pytest.approx(float(fn(self.A, self.B)), rel=1e-9)
        Ja_ad = _ad_jac(lambda a: fn(a, self.B), self.A)
        Jb_ad = _ad_jac(lambda b: fn(self.A, b), self.B)
        np.testing.assert_allclose(np.asarray(Ja), np.asarray(Ja_ad),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(Jb), np.asarray(Jb_ad),
                                   atol=1e-8)

    def test_maha_distance(self):
        var = jnp.array([2.0, 1.0, 0.5])
        d, Ja, Jb = distances.maha_norm_with_jac(self.A, self.B, var)
        expect = float(jnp.sqrt(jnp.sum((self.A - self.B) ** 2 / var)))
        assert float(d) == pytest.approx(expect, rel=1e-10)
        np.testing.assert_allclose(np.asarray(Jb), -np.asarray(Ja))

    def test_cosine_zero_guard(self):
        d, Ja, Jb = distances.cosine_with_jac(jnp.zeros(3), self.B)
        assert float(d) == 0.0
        assert bool(jnp.all(Ja == 0)) and bool(jnp.all(Jb == 0))


class TestRobustNormSolve:
    def test_outlier_rejection_in_circle_fit(self):
        """A robustified circle fit ignores a gross outlier (integration —
        the reference exercises robust norms inside full solves)."""
        import tinyopt_tpu as to
        from tinyopt_tpu.models.problems import make_circle

        residuals, x0 = make_circle(n=12)
        # Append one gross outlier observation
        def robust_residuals(x):
            r = residuals(x)
            r_out = jnp.sum((jnp.array([50.0, -30.0]) - x[:2]) ** 2) - x[2] ** 2
            r_all = jnp.concatenate([r, r_out[None]])
            # th² sits between the inlier residuals at the start point
            # (n² ≈ 5e3) and the gross outlier (n² ≈ 1.2e7).
            return jax.vmap(
                lambda ri: robust_norms.robust_whiten(
                    ri[None], robust_norms.tukey, 1e5)[0])(r_all)

        # Conservative initial damping: an undamped first step jumps onto
        # the all-outlier plateau (zero gradient), which stops LM — the
        # reference's LM has the same behavior by design.
        x, out = to.optimize(x0, robust_residuals, to.Options(
            max_iters=100, lm=to.LMOptions(damping_init=1.0)))
        assert float(x[0]) == pytest.approx(2.0, abs=2e-2)
        assert float(x[1]) == pytest.approx(7.0, abs=2e-2)
        assert abs(float(x[2])) == pytest.approx(2.0, abs=2e-2)


class TestRobustCost:
    """robust_cost: the inlier-accounting Cost producer (reference *Loss
    composers + Cost inlier merging, robust_norms.h:60-63, cost.h:51-64)."""

    def test_inlier_ratio_counts_blocks(self):
        from tinyopt_tpu.losses.robust_norms import huber, robust_cost
        r = jnp.asarray([[0.1, 0.0], [3.0, 4.0], [0.2, 0.1], [10.0, 0.0]])
        c = robust_cost(r, huber, 1.0)            # th² = 1: 2 of 4 inliers
        assert int(c.num_residuals) == 4
        assert float(c.inlier_ratio) == pytest.approx(0.5)
        # inlier blocks contribute their exact squared norm
        assert float(c.cost) > 0

    def test_flows_through_optimize_acc(self):
        """A manual acc returning robust_cost: Output.final_cost carries
        the inlier ratio (plumbed through the loop's best-cost tracking).
        One scalar parameter fit to 4 measurements, one of which is a
        gross outlier the optimum cannot zero — it must be COUNTED as an
        outlier at the solution."""
        from tinyopt_tpu.losses.robust_norms import huber, robust_cost
        y = jnp.asarray([0.0, 0.1, -0.1, 10.0])   # one gross outlier

        def cost_fn(x):
            return robust_cost(x - y, huber, 0.25).cost

        def acc(x, *_):
            c = robust_cost(x - y, huber, 0.25)
            g = jax.grad(cost_fn)(x)
            H = jax.hessian(cost_fn)(x)
            return c, g, H + jnp.eye(1) * 1e-9

        import tinyopt_tpu as to
        x, out = to.optimize(jnp.asarray([0.5]), acc,
                             to.Options(max_iters=40,
                                        max_consec_failures=0),
                             mode="acc")
        assert bool(out.succeeded())
        assert abs(float(x[0])) < 0.2              # robust: near inliers
        assert float(out.final_cost.inlier_ratio) == pytest.approx(0.75)
