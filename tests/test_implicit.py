"""Differentiable solves via implicit differentiation.

No reference counterpart (SURVEY.md §2.3 — a JAX-native capability);
validated against analytic derivatives and finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to


class TestImplicitDiff:
    def test_linear_least_squares_analytic(self):
        """x*(θ) = θ for r = x − θ, so dx*/dθ = I and any loss gradient
        passes through unchanged."""
        solve = to.implicit_solver(lambda x, th: x - th,
                                   x_example=jnp.zeros(3))

        def outer_loss(theta):
            x_opt = solve(theta, jnp.zeros(3))
            return jnp.sum(x_opt ** 2)

        theta = jnp.array([1.0, -2.0, 0.5])
        g = jax.grad(outer_loss)(theta)
        np.testing.assert_allclose(np.asarray(g), 2.0 * np.asarray(theta),
                                   atol=1e-6)

    def test_weighted_fit_matches_finite_differences(self):
        """Solve a weighted fit; d(loss)/d(weights) via IFT == numeric."""
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(12, 3)))
        b = jnp.asarray(rng.normal(size=12))
        target = jnp.asarray(rng.normal(size=3))

        def residual(x, logw):
            return jnp.exp(logw) * (A @ x - b)

        solve = to.implicit_solver(residual, x_example=jnp.zeros(3))

        def outer(logw):
            x_opt = solve(logw, jnp.zeros(3))
            return jnp.sum((x_opt - target) ** 2)

        logw0 = jnp.asarray(rng.normal(size=12) * 0.3)
        g = jax.grad(outer)(logw0)
        # central finite differences
        eps = 1e-5
        g_num = np.zeros(12)
        for i in range(12):
            e = jnp.zeros(12).at[i].set(eps)
            g_num[i] = (float(outer(logw0 + e)) - float(outer(logw0 - e))) \
                / (2 * eps)
        np.testing.assert_allclose(np.asarray(g), g_num, atol=1e-4)

    def test_jit_and_vmap(self):
        solve = to.implicit_solver(lambda x, th: x * x - th,
                                   x_example=jnp.ones(1))
        f = jax.jit(jax.vmap(lambda th: solve(th, jnp.ones(1))[0]))
        thetas = jnp.array([[2.0], [3.0], [4.0]])
        np.testing.assert_allclose(np.asarray(f(thetas)),
                                   np.sqrt([2.0, 3.0, 4.0]), atol=1e-6)
        # d sqrt(th)/dth = 1/(2 sqrt(th))
        g = jax.grad(lambda th: solve(th, jnp.ones(1))[0])(jnp.array([4.0]))
        assert float(g[0]) == pytest.approx(0.25, abs=1e-6)

    def test_manifold_params_rejected(self):
        from tinyopt_tpu.manifolds import SO3
        with pytest.raises(NotImplementedError):
            to.implicit_solver(lambda x, th: x.log(),
                               x_example=SO3.identity())

    def test_bilevel_robust_threshold_learning(self):
        """Learn a robust threshold by gradient descent through the solver
        — the bilevel use case."""
        from tinyopt_tpu.losses import robust_norms
        rng = np.random.default_rng(2)
        clean = jnp.asarray(rng.normal(size=8))
        obs = clean.at[0].add(25.0)  # one gross outlier

        def residual(x, log_th2):
            r = obs - x[0]
            th2 = jnp.exp(log_th2[0])
            return jax.vmap(lambda ri: robust_norms.robust_whiten(
                ri[None], robust_norms.cauchy, th2)[0])(r)

        solve = to.implicit_solver(residual, x_example=jnp.zeros(1),
                                   options=to.Options(max_iters=30))

        def outer(log_th2):
            x_opt = solve(log_th2, jnp.zeros(1))
            return (x_opt[0] - jnp.mean(clean)) ** 2

        g = jax.grad(outer)(jnp.array([3.0]))
        assert bool(jnp.isfinite(g[0])) and float(jnp.abs(g[0])) > 0
