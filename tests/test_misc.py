"""Cost accumulation, warm start, logging fields, timing utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.cost import Cost


class TestCostAccumulation:
    def test_add_merges_counts_and_inliers(self):
        """Partial-cost accumulation (reference cost.h:51-64)."""
        a = Cost.make(1.0, 10, 0.8)
        b = Cost.make(2.0, 30, 1.0)
        c = a + b
        assert float(c.cost) == pytest.approx(3.0)
        assert int(c.num_residuals) == 40
        assert float(c.inlier_ratio) == pytest.approx((8 + 30) / 40)

    def test_from_residuals(self):
        c = Cost.from_residuals(jnp.array([3.0, 4.0]))
        assert float(c.cost) == pytest.approx(25.0)
        assert int(c.num_residuals) == 2

    def test_to_string(self):
        s = Cost.make(4.0, 4, 0.5).to_string(print_inliers=True)
        assert "n:4" in s and "in:" in s


class TestWarmStart:
    def test_warm_start_skips_first_build(self):
        """With InitWith-style warm start, the first step is proposed from
        the supplied system (reference optimizer.h:46-55)."""
        target = jnp.array([2.0, -1.0])
        fn = lambda p: p - target

        # Exact system at x0=0: J=I, r=-target → g=-target, H=I. The first
        # step is then the full Newton step; one iteration lands exactly.
        g0 = -target
        H0 = jnp.eye(2)
        solve = to.build_solver(fn, to.Options(), "residuals",
                                jnp.zeros(2), warm_start=(g0, H0))
        x, out = jax.jit(solve)(jnp.zeros(2))
        np.testing.assert_allclose(np.asarray(x), np.asarray(target),
                                   atol=1e-5)
        assert bool(out.converged())

    def test_warm_start_with_no_carry_raises(self):
        with pytest.raises(ValueError):
            to.build_solver(
                lambda p: p, to.Options(
                    hessian=to.HessianOptions(save_last=False,
                                              carry_system=False)),
                "residuals", jnp.zeros(2),
                warm_start=(jnp.zeros(2), jnp.eye(2)))(jnp.zeros(2))

    def test_gd_size1_array_cost_requires_explicit_mode(self):
        """A size-1 *array* return is ambiguous for GD auto-dispatch (boxed
        scalar cost vs Vec1 residual optimize different objectives); the
        reference statically rejects non-scalars (optimize.h:59-72)."""
        opts = to.Options(solver_type=to.GradientDescent)
        with pytest.raises(ValueError, match="ambiguous"):
            to.optimize(jnp.asarray([1.0]), lambda p: p * 2, opts)
        # explicit modes resolve it either way
        x, _ = to.optimize(jnp.asarray([1.0]), lambda p: (p - 3.0) ** 2,
                           to.Options(solver_type=to.GradientDescent,
                                      max_iters=2000,
                                      gd=to.GDOptions(lr=0.1)),
                           mode="cost")
        assert float(x[0]) == pytest.approx(3.0, abs=1e-3)
        x, _ = to.optimize(jnp.asarray([1.0]), lambda p: p - 2.0,
                           to.Options(solver_type=to.GradientDescent,
                                      max_iters=2000,
                                      gd=to.GDOptions(lr=0.2)),
                           mode="residuals")
        assert float(x[0]) == pytest.approx(2.0, abs=1e-3)

    def test_timeout_check_final_cost_with_cost_scaling(self):
        """The timeout driver's final-cost comparison must use the same
        normalization as the loop (regression: raw-vs-normalized)."""
        fn = lambda x: (x - 3.0) ** 2
        opts = dict(solver_type=to.GradientDescent, max_iters=5,
                    check_final_cost=True, min_error=0, min_rerr_dec=0,
                    min_step_norm2=0, min_grad_norm2=0,
                    gd=to.GDOptions(lr=0.1),
                    cost=to.CostScalingOptions(downscale_by_2=True))
        xa, _ = to.optimize(jnp.asarray(0.0), fn,
                            to.Options(**opts, max_duration_ms=60_000),
                            mode="cost")
        xb, _ = to.optimize(jnp.asarray(0.0), fn, to.Options(**opts),
                            mode="cost")
        assert float(xa) == pytest.approx(float(xb), rel=1e-12)

    def test_wrong_warm_start_recovers(self):
        """A bad warm-start system still converges (the step gets rejected
        and the loop rebuilds)."""
        fn = lambda x: x * x - 2.0
        solve = to.build_solver(
            fn, to.Options(max_consec_failures=0), "residuals",
            jnp.asarray(1.0),
            warm_start=(jnp.array([100.0]), jnp.array([[0.01]])))
        x, out = jax.jit(solve)(jnp.asarray(1.0))
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-5)


class TestLoggingFields:
    def test_print_extras_do_not_break_solve(self, capfd):
        opts = to.Options(log=to.LogOptions(enable=True, print_x=True,
                                            print_dx=True,
                                            print_inliers=True,
                                            print_max_stdev=True))
        x, out = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0, opts)
        jax.effects_barrier()
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-6)
        captured = capfd.readouterr()
        assert "x:" in captured.out and "sigma:" in captured.out

    def test_print_emoji_and_t(self, capfd):
        """Golden log line with print_emoji + print_t (reference
        optimizer.h:465,513): ℹ️ first eval, ✅ on accepted iterations,
        monotone non-negative τ (cumulative host ms)."""
        opts = to.Options(log=to.LogOptions(enable=True, print_emoji=True,
                                            print_t=True))
        x, out = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0, opts)
        jax.effects_barrier()
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-6)
        lines = [l for l in capfd.readouterr().out.splitlines()
                 if "τ:" in l]
        assert len(lines) == int(out.num_iters)
        assert lines[0].startswith("ℹ️")          # first eval
        assert all(l.startswith("✅") for l in lines[1:])  # sqrt2: all good
        taus = [float(l.split("τ:")[1].split()[0]) for l in lines]
        assert taus[0] >= 0.0
        assert all(b >= a for a, b in zip(taus, taus[1:]))  # cumulative

    def test_print_emoji_marks_rejections(self, capfd):
        """A solve with rejected steps shows ❌ lines."""
        opts = to.Options(max_consec_failures=0,
                          log=to.LogOptions(enable=True, print_emoji=True))
        x, out = to.optimize(jnp.asarray(0.5), lambda x: x * x - 2.0, opts)
        jax.effects_barrier()
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-5)
        assert "❌" in capfd.readouterr().out

    def test_print_j_jet(self, capfd):
        """print_J_jet logs the AD Jacobian from the NLLS adapter
        (reference optimize_autodiff.h:158-161)."""
        opts = to.Options(log=to.LogOptions(enable=True, print_J_jet=True))
        x, out = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0, opts)
        jax.effects_barrier()
        assert "J:" in capfd.readouterr().out


class TestSaveHistoryOff:
    def test_throughput_mode_empty_history(self):
        opts = to.Options(save_history=False)
        x, out = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0, opts)
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-6)
        assert out.errs.shape == (0,)
        assert out.errs_list == []
        assert int(out.num_hist) == 0
        # main results unaffected
        assert bool(out.converged())
        assert int(out.num_iters) == 5


class TestMultiStart:
    def test_himmelblau_global_best(self):
        from tinyopt_tpu.models.problems import himmelblau_residuals
        starts = jnp.array([[3.0, 2.0], [-2.8, 3.1], [100.0, 100.0]])
        x, out, outs = to.multi_start_optimize(
            starts, himmelblau_residuals, to.Options(max_iters=100))
        assert bool(out.succeeded())
        r = himmelblau_residuals(x)
        assert float(jnp.max(jnp.abs(r))) < 1e-5
        assert outs.final_cost.cost.shape == (3,)


class TestUtils:
    def test_tic_toc(self):
        t0 = to.utils.tic()
        assert to.utils.toc_ms(t0) >= 0.0

    def test_block_ms(self):
        f = jax.jit(lambda x: x * 2.0)
        ms = to.utils.block_ms(f, jnp.ones(8), n=2)
        assert ms > 0

    def test_debug_nans_context(self):
        with to.utils.debug_nans(True):
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()


class TestUtilsSmoke:
    def test_version_and_float_epsilon(self):
        import tinyopt_tpu as to_
        assert isinstance(to_.__version__, str) and to_.__version__
        from tinyopt_tpu.utils import float_epsilon
        assert float_epsilon(jnp.float64) == 1e-7   # math.h:297-301
        assert float_epsilon(jnp.float32) == 1e-4

    def test_device_trace_and_block_ms(self, tmp_path):
        from tinyopt_tpu.utils import block_ms, device_trace
        f = jax.jit(lambda x: x * 2.0)
        with device_trace(str(tmp_path)):
            f(jnp.ones(4))
        ms = block_ms(f, jnp.ones(4), n=2)
        assert ms > 0
