"""Native (C++) micro-runtime tests.

The host-side dense LM core (tinyopt_tpu/native/tinyopt_native.cpp) must
agree with the XLA path on converged results and stop-reason semantics —
it is the µs-latency backend for the reference's headline regime
(reference: benchmarks/dense.cpp:28-114).
"""

import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu import native


class TestBuiltinProblems:
    def test_sqrt2(self):
        res = native.bench_sqrt2(1.0)
        assert res.stop_reason == int(to.StopReason.MIN_ERROR)
        assert res.x[0] == pytest.approx(np.sqrt(2), abs=1e-8)
        assert res.num_iters == 5  # same trajectory as the XLA path

    def test_prior_50(self):
        rng = np.random.default_rng(0)
        d = 50
        y = rng.uniform(-1, 1, d)
        std = rng.uniform(0.1, 1.1, d)
        x0 = rng.uniform(-1, 1, d)
        res = native.bench_prior(y, 1.0 / std, x0)
        assert res.stop_reason > 0
        np.testing.assert_allclose(res.x, y, atol=1e-6)


class TestCallbackPath:
    def test_rosenbrock(self):
        def rj(x):
            r = np.array([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])
            J = np.array([[-1.0, 0.0], [-20.0 * x[0], 10.0]])
            return r, J

        res = native.native_optimize(
            np.array([-1.2, 1.0]), rj, 2,
            native.make_options(max_iters=100, max_consec_failures=20))
        assert res.stop_reason > 0
        np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-5)

    def test_gd(self):
        def rj(x):
            return x.copy(), np.eye(3)

        res = native.native_optimize(
            np.array([1.0, -2.0, 3.0]), rj, 3,
            native.make_options("gd", max_iters=5000, gd_lr=0.05))
        assert np.max(np.abs(res.x)) < 1e-3

    def test_gn(self):
        def rj(x):
            return np.array([x[0] * x[0] - 2.0]), np.array([[2.0 * x[0]]])

        res = native.native_optimize(np.array([1.5]), rj, 1,
                                     native.make_options("gn"))
        assert res.x[0] == pytest.approx(np.sqrt(2), abs=1e-8)

    def test_nan_detection(self):
        def rj(x):
            return np.array([np.nan]), np.array([[1.0]])

        res = native.native_optimize(np.array([1.0]), rj, 1)
        assert res.stop_reason == int(to.StopReason.SYSTEM_HAS_NAN_OR_INF)

    def test_failure_budget(self):
        # Constant residual with a gradient pointing uphill: every step
        # is rejected.
        def rj(x):
            return np.array([1.0 + x[0] * x[0]]), np.array([[-2.0]])

        res = native.native_optimize(
            np.array([2.0]), rj, 1,
            native.make_options(max_consec_failures=3, min_error=0,
                                min_rerr_dec=0, min_step_norm2=0,
                                min_grad_norm2=0))
        assert res.stop_reason == int(to.StopReason.MAX_CONSEC_NO_DECR)


class TestAgreementWithXLA:
    def test_same_convergence_trajectory(self):
        """Native and XLA paths take the same number of iterations and
        reach the same cost on sqrt2 (identical λ schedules)."""
        import jax.numpy as jnp
        x, out = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0)
        res = native.bench_sqrt2(1.0)
        assert res.num_iters == int(out.num_iters)
        assert res.final_cost == pytest.approx(float(out.final_cost.cost),
                                               rel=1e-6, abs=1e-18)

    def test_prior_trajectory_parity(self):
        """Multi-iteration accepted-path parity: identical iteration count
        and cost (regression for the λ-ordering bug: the solve must use
        the pre-GoodStep λ, like the reference)."""
        import jax.numpy as jnp
        rng = np.random.default_rng(5)
        d = 6
        y = rng.uniform(-1, 1, d)
        std = rng.uniform(0.1, 1.1, d)
        x0 = rng.uniform(-1, 1, d)
        res = native.bench_prior(y, 1.0 / std, x0)
        x_py, out_py = to.optimize(
            jnp.asarray(x0),
            lambda x: (x - jnp.asarray(y)) * jnp.asarray(1.0 / std))
        assert res.num_iters == int(out_py.num_iters)
        assert res.final_cost == pytest.approx(
            float(out_py.final_cost.cost), rel=1e-9, abs=1e-20)

    def test_callback_exception_propagates(self):
        """A raising residual callback must surface, not 'converge'."""
        with pytest.raises(ZeroDivisionError):
            native.native_optimize(np.array([1.0]), lambda x: 1 / 0, 1)

    def test_unknown_option_name_rejected(self):
        with pytest.raises(TypeError):
            native.make_options(max_iter=5)  # typo for max_iters


class TestFloat32:
    """f32 instantiation of the native core (reference float suite,
    densef.cpp:24-50; published row: sqrt2-float 0.91 µs)."""

    def test_sqrt2_f32(self):
        res = native.bench_sqrt2_f32(1.0)
        assert res.x.dtype == np.float32
        assert abs(float(res.x[0]) - 2 ** 0.5) < 1e-4
        assert res.stop_reason > 0

    def test_prior_f32_converges_to_f32_floor(self):
        rng = np.random.default_rng(2)
        for d in (3, 12, 50):
            y = rng.uniform(-1, 1, d)
            std = rng.uniform(0.1, 1.1, d)
            res = native.bench_prior_f32(y, 1.0 / std, np.zeros(d))
            assert res.stop_reason > 0, (d, res.stop_reason)
            np.testing.assert_allclose(res.x, y.astype(np.float32),
                                       atol=1e-4)

    def test_f32_matches_f64_iterations_on_sqrt2(self):
        """Same λ schedule until the f32 floor: the scalar-templated core
        must not change ACCEPT/REJECT semantics, only precision."""
        r64 = native.bench_sqrt2(1.0)
        r32 = native.bench_sqrt2_f32(1.0)
        # f32 hits min_error (rescaled) one iteration earlier or equal
        assert 0 < r32.num_iters <= r64.num_iters
        assert r32.stop_reason == r64.stop_reason == 1  # MIN_ERROR

    def test_callback_f32(self):
        res = native.native_optimize_f32(
            np.zeros(2, np.float32),
            lambda x: (np.array([x[0] - 1.0, x[1] + 2.0]),
                       np.eye(2, dtype=np.float32)), 2)
        assert res.x.dtype == np.float32
        np.testing.assert_allclose(res.x, [1.0, -2.0], atol=1e-3)

    def test_make_options_dtype(self):
        o32 = native.make_options(dtype=np.float32)
        o64 = native.make_options()
        assert o32.min_step_norm2 == pytest.approx(
            o64.min_step_norm2 * 1e6)
        assert o32.min_rerr_dec == pytest.approx(o64.min_rerr_dec * 1e3)
        with pytest.raises(TypeError, match="f32/f64"):
            native.make_options(dtype=np.int32)

    def test_f32_explicit_threshold_not_rescaled(self):
        o = native.make_options(dtype=np.float32, min_error=1e-3)
        assert o.min_error == 1e-3
