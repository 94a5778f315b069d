"""Solver-layer unit tests (below the optimizer).

Mirror of the reference tests/solvers.cpp:19-108: step proposal across
LM/GN/GD directly, the λ-schedule state machine, and the damping math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.ops.linalg import damp_diagonal, inv_cov, max_std_dev, solve_psd
from tinyopt_tpu.solvers.lm import (LMState, lm_bad_step, lm_failed_step,
                                    lm_good_step, lm_init)
from tinyopt_tpu.solvers.step import propose_step


class TestProposeStep:
    H = jnp.array([[4.0, 1.0], [1.0, 3.0]])
    g = jnp.array([1.0, -2.0])

    def test_gn_step_solves_normal_equations(self):
        opts = to.Options(solver_type=to.GaussNewton)
        dx, ok = propose_step(self.H, self.g, jnp.asarray(0.0), opts)
        assert bool(ok)
        np.testing.assert_allclose(
            np.asarray(self.H @ dx), -np.asarray(self.g), atol=1e-12)

    def test_lm_step_damps_diagonal(self):
        opts = to.Options()
        lam = jnp.asarray(0.5)
        dx, ok = propose_step(self.H, self.g, lam, opts)
        Hd = np.asarray(self.H) + 0.5 * np.diag(np.diag(np.asarray(self.H)))
        np.testing.assert_allclose(np.asarray(Hd @ dx),
                                   -np.asarray(self.g), atol=1e-12)

    def test_gd_step(self):
        opts = to.Options(solver_type=to.GradientDescent,
                          gd=to.GDOptions(lr=0.1))
        dx, ok = propose_step(None, self.g, jnp.asarray(0.0), opts)
        np.testing.assert_allclose(np.asarray(dx), -0.1 * np.asarray(self.g))

    def test_non_psd_failure_detected(self):
        bad = jnp.array([[1.0, 0.0], [0.0, -1.0]])
        dx, ok = propose_step(bad, self.g, jnp.asarray(0.0),
                              to.Options(solver_type=to.GaussNewton))
        assert not bool(ok)

    def test_unchecked_inverse_path(self):
        opts = to.Options(solver_type=to.GaussNewton,
                          hessian=to.HessianOptions(use_ldlt=False))
        dx, ok = propose_step(self.H, self.g, jnp.asarray(0.0), opts)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(self.H @ dx),
                                   -np.asarray(self.g), atol=1e-10)

    def test_1d_fast_path(self):
        dx, ok = propose_step(jnp.array([[4.0]]), jnp.array([2.0]),
                              jnp.asarray(0.0),
                              to.Options(solver_type=to.GaussNewton))
        assert bool(ok) and float(dx[0]) == pytest.approx(-0.5)


class TestCGSolver:
    def test_cg_matches_cholesky_solution(self):
        from tinyopt_tpu.ops.linalg import solve_psd_cg
        rng = np.random.default_rng(5)
        A = jnp.asarray(rng.uniform(-1, 1, (7, 9)))
        H = A @ A.T + 0.5 * jnp.eye(7)
        b = jnp.asarray(rng.uniform(-1, 1, 7))
        dx = solve_psd_cg(H, b, iters=7)
        np.testing.assert_allclose(np.asarray(dx),
                                   np.linalg.solve(np.asarray(H),
                                                   np.asarray(b)), atol=1e-8)

    def test_cg_option_converges(self):
        opts = to.Options(hessian=to.HessianOptions(solver="cg"))
        x, out = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0, opts)
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-6)

    def test_no_carry_mode_identical_trajectory(self):
        """carry_system=False re-accumulates instead of carrying H; the
        accepted-path trajectory is identical."""
        opts_nc = to.Options(hessian=to.HessianOptions(save_last=False,
                                                       carry_system=False))
        opts_c = to.Options(hessian=to.HessianOptions(save_last=False))
        xa, oa = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0,
                             opts_nc)
        xb, ob = to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0,
                             opts_c)
        assert float(xa) == float(xb)
        assert int(oa.num_iters) == int(ob.num_iters)
        # rejection recovery still works without the carried system
        xc, oc = to.optimize(jnp.asarray(0.5), lambda x: x * x - 2.0,
                             opts_nc.replace(max_consec_failures=0))
        assert float(xc) == pytest.approx(np.sqrt(2), abs=1e-5)

    def test_no_carry_with_save_last_raises(self):
        with pytest.raises(ValueError):
            to.optimize(jnp.asarray(1.0), lambda x: x * x - 2.0,
                        to.Options(hessian=to.HessianOptions(
                            carry_system=False)))

    def test_cg_option_batched_vmap(self):
        """The custom_vmap route (the batched solver path)."""
        import jax
        opts = to.Options(hessian=to.HessianOptions(solver="cg",
                                                    cg_iters=10))
        solve = to.build_solver(lambda p: p * p - jnp.arange(1.0, 4.0),
                                opts, "residuals", jnp.ones(3))
        xs, outs = jax.jit(jax.vmap(solve))(jnp.ones((4, 3)))
        np.testing.assert_allclose(
            np.asarray(xs), np.sqrt(np.arange(1.0, 4.0))[None, :].repeat(4, 0),
            atol=1e-5)


class TestLMSchedule:
    """λ state machine (lm.h:123-154)."""

    OPTS = to.Options()

    def _init(self):
        return lm_init(self.OPTS, jnp.dtype(jnp.float64))

    def test_init(self):
        s = self._init()
        assert float(s.lam) == pytest.approx(1e-4)
        assert float(s.bad_factor) == pytest.approx(2.0)

    def test_good_step_divides(self):
        s = lm_good_step(self._init(), jnp.asarray(0.0), self.OPTS)
        assert float(s.lam) == pytest.approx(1e-4 / 3.0)

    def test_bad_step_compounds(self):
        s = self._init()
        s1 = lm_bad_step(s, self.OPTS)
        assert float(s1.lam) == pytest.approx(2e-4)
        assert float(s1.bad_factor) == pytest.approx(4.0)
        s2 = lm_bad_step(s1, self.OPTS)
        assert float(s2.lam) == pytest.approx(8e-4)   # ×4 this time
        assert float(s2.bad_factor) == pytest.approx(8.0)

    def test_good_step_reverts_compounded_bad(self):
        """After consecutive bad steps, a good step divides by the
        compounded factor (lm.h:129-136)."""
        s = lm_bad_step(lm_bad_step(self._init(), self.OPTS), self.OPTS)
        s_good = lm_good_step(s, jnp.asarray(0.0), self.OPTS)
        # λ = 8e-4 / bad_factor(8) · ... reverted toward the pre-failure λ
        assert float(s_good.lam) < float(s.lam)
        assert float(s_good.bad_factor) == pytest.approx(2.0)

    def test_quality_based_good_step(self):
        opts = to.Options(use_step_quality_approx=True)
        # quality 1 → scale max(1/3, 1-(2-1)³) = 1/3
        s = lm_good_step(self._init(), jnp.asarray(1.0), opts)
        assert float(s.lam) == pytest.approx(1e-4 / 3.0)
        # quality 0.5 → scale max(1/3, 1-0) = 1
        s2 = lm_good_step(self._init(), jnp.asarray(0.5), opts)
        assert float(s2.lam) == pytest.approx(1e-4)

    def test_damping_clamped(self):
        opts = to.Options(lm=to.LMOptions(damping_init=1e8,
                                          damping_range=(1e-9, 1e9)))
        s = LMState(lam=jnp.asarray(1e8), bad_factor=jnp.asarray(2.0))
        for _ in range(5):
            s = lm_bad_step(s, opts)
        assert float(s.lam) == pytest.approx(1e9)  # clamped at the ceiling

    def test_failed_step_equals_bad_step(self):
        s = self._init()
        np.testing.assert_allclose(
            float(lm_failed_step(s, self.OPTS).lam),
            float(lm_bad_step(s, self.OPTS).lam))


class TestLinalg:
    def test_damp_diagonal_batched(self):
        H = jnp.stack([jnp.eye(3) * 2.0, jnp.eye(3) * 4.0])
        Hd = damp_diagonal(H, jnp.asarray(0.5))
        np.testing.assert_allclose(np.asarray(Hd[0]), np.eye(3) * 3.0)
        np.testing.assert_allclose(np.asarray(Hd[1]), np.eye(3) * 6.0)

    def test_solve_psd_batched(self):
        H = jnp.stack([jnp.eye(2) * 2.0, jnp.eye(2) * 4.0])
        b = jnp.ones((2, 2))
        dx, ok = solve_psd(H, b)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(dx[0]), [0.5, 0.5])
        np.testing.assert_allclose(np.asarray(dx[1]), [0.25, 0.25])

    def test_inv_cov_and_max_std_dev(self):
        H = jnp.diag(jnp.array([4.0, 0.25]))
        C = inv_cov(H)
        np.testing.assert_allclose(np.asarray(C),
                                   np.diag([0.25, 4.0]), atol=1e-12)
        assert float(max_std_dev(H)) == pytest.approx(2.0)


class TestSolverTypesEndToEnd:
    """TEMPLATE_TEST_CASE analogue: same problem through LM/GN/GD
    (tests/solvers.cpp:19-68)."""

    @pytest.mark.parametrize("st,opts_kw", [
        (to.LevenbergMarquardt, {}),
        (to.GaussNewton, {}),
        (to.GradientDescent, dict(max_iters=3000, gd=to.GDOptions(lr=0.05))),
    ])
    def test_quadratic_bowl(self, st, opts_kw):
        target = jnp.array([1.0, -2.0])
        if st == to.GradientDescent:
            fn = lambda p: jnp.sum((p - target) ** 2)
        else:
            fn = lambda p: p - target
        x, out = to.optimize(jnp.zeros(2), fn,
                             to.Options(solver_type=st, **opts_kw))
        np.testing.assert_allclose(np.asarray(x), np.asarray(target),
                                   atol=1e-3)
        assert bool(out.succeeded())
