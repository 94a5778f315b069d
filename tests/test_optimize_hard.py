"""End-to-end convergence: hard suite.

Mirror of reference tests/optimize_hard.cpp — Beale, Himmelblau, Wood,
Freudenstein-Roth, Jennrich-Sampson (the reference disables Wood and
Freudenstein-Roth pending trust-region; here LM with appropriate budgets
handles them, so they are enabled).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.models.problems import (
    beale_residuals, freudenstein_roth_residuals, himmelblau_residuals,
    jennrich_sampson_residuals, wood_residuals)


class TestBeale:
    def test_converges(self):
        # Reference options (optimize_hard.cpp:48-53): unlimited consecutive
        # failures, λ₀ = 1e-3.
        x, out = to.optimize(jnp.array([1.0, 1.0]), beale_residuals,
                             to.Options(max_iters=200,
                                        max_consec_failures=0,
                                        min_error=1e-30,
                                        lm=to.LMOptions(damping_init=1e-3)))
        assert bool(out.succeeded())
        assert not out.num_diff_used
        assert float(x[0]) == pytest.approx(3.0, abs=1e-4)
        assert float(x[1]) == pytest.approx(0.5, abs=1e-4)


class TestHimmelblau:
    def test_converges_to_nearest_minimum(self):
        """Start near (3, 2), one of the four minima
        (optimize_hard.cpp:74-101)."""
        x, out = to.optimize(jnp.array([2.0, 1.5]), himmelblau_residuals,
                             to.Options(max_iters=100))
        assert bool(out.succeeded())
        assert not out.num_diff_used
        assert float(x[0]) == pytest.approx(3.0, abs=1e-4)
        assert float(x[1]) == pytest.approx(2.0, abs=1e-4)

    def test_all_four_minima_reachable(self):
        import jax
        starts = jnp.array([[3.0, 2.0], [-2.8, 3.1], [-3.7, -3.2],
                            [3.5, -1.8]])
        solve = to.build_solver(himmelblau_residuals,
                                to.Options(max_iters=100), "residuals",
                                starts[0])
        xs, outs = jax.jit(jax.vmap(solve))(starts)
        # Every solve reaches a point with ~zero residuals
        r = jax.vmap(himmelblau_residuals)(xs)
        assert float(jnp.max(jnp.abs(r))) < 1e-5


class TestWood:
    def test_converges(self):
        """Wood takes a while (optimize_hard.cpp:132: max_iters=500)."""
        x, out = to.optimize(jnp.array([-3.0, -1.0, -3.0, -1.0]),
                             wood_residuals,
                             to.Options(max_iters=500,
                                        max_consec_failures=0))
        assert bool(out.succeeded())
        for i in range(4):
            assert float(x[i]) == pytest.approx(1.0, abs=1e-3)


class TestFreudensteinRoth:
    def test_reaches_global_or_local_minimum(self):
        """From (0.5, -2) LM reaches either the global minimum (5, 4) or
        the well-known local minimum near (11.41, -0.897) — the reference
        disabled this test pending trust-region methods
        (optimize_hard.cpp:289-295)."""
        x, out = to.optimize(jnp.array([0.5, -2.0]),
                             freudenstein_roth_residuals,
                             to.Options(max_iters=500,
                                        max_consec_failures=0))
        assert bool(out.succeeded())
        at_global = (abs(float(x[0]) - 5.0) < 1e-3
                     and abs(float(x[1]) - 4.0) < 1e-3)
        at_local = (abs(float(x[0]) - 11.4128) < 1e-2
                    and abs(float(x[1]) + 0.8968) < 1e-2)
        assert at_global or at_local, x

    def test_global_from_good_start(self):
        x, out = to.optimize(jnp.array([6.0, 3.5]),
                             freudenstein_roth_residuals,
                             to.Options(max_iters=200))
        assert float(x[0]) == pytest.approx(5.0, abs=1e-4)
        assert float(x[1]) == pytest.approx(4.0, abs=1e-4)


class TestJennrichSampson:
    def test_converges_to_symmetric_minimum(self):
        """Minimum at x1 = x2 ≈ 0.2578 (optimize_hard.cpp:285-286)."""
        x, out = to.optimize(jnp.array([0.3, 0.4]),
                             jennrich_sampson_residuals,
                             to.Options(max_iters=200,
                                        max_consec_failures=0))
        assert bool(out.succeeded())
        assert float(x[0]) == pytest.approx(float(x[1]), abs=1e-5)
        assert float(x[0]) == pytest.approx(0.2578, abs=1e-3)
