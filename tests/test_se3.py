"""SO(3)/SE(3) manifold tests.

Mirror of reference tests/sophus.cpp:27-46 and tests/lieplusplus.cpp:43-62
(pose-prior optimization on the SE(3) manifold), plus exp/log roundtrip and
AD-safety checks for the from-scratch Lie-group implementation, and the
flagship batched SE(3) refinement model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.manifolds import SE3, SO3


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = jnp.array([0.3, -0.5, 0.8])
        np.testing.assert_allclose(np.asarray(SO3.exp(w).log()),
                                   np.asarray(w), atol=1e-12)

    def test_exp_log_small_angle(self):
        w = jnp.array([1e-9, -2e-9, 1e-10])
        np.testing.assert_allclose(np.asarray(SO3.exp(w).log()),
                                   np.asarray(w), atol=1e-15)

    def test_matrix_apply_consistency(self):
        R = SO3.exp(jnp.array([0.2, 0.7, -0.4]))
        p = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(R.apply(p)),
                                   np.asarray(R.matrix() @ p), atol=1e-12)

    def test_from_matrix_roundtrip(self):
        R = SO3.exp(jnp.array([1.2, -0.3, 2.0]))
        R2 = SO3.from_matrix(R.matrix())
        # Quaternion double cover: compare rotations, not quaternions
        np.testing.assert_allclose(np.asarray(R2.matrix()),
                                   np.asarray(R.matrix()), atol=1e-10)

    @pytest.mark.parametrize("axis", [
        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
        [1.0, -1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, -1.0],
    ])
    def test_from_matrix_180_degree_rotations(self, axis):
        """Shepperd reconstruction at qw = 0 (the degenerate case where
        antisymmetric-part sign fixes fail)."""
        a = jnp.asarray(axis, jnp.float64)
        a = a / jnp.linalg.norm(a)
        R = SO3.exp(jnp.pi * a)
        R2 = SO3.from_matrix(R.matrix())
        np.testing.assert_allclose(np.asarray(R2.matrix()),
                                   np.asarray(R.matrix()), atol=1e-10)

    def test_from_matrix_random_dense_sweep(self):
        rng = np.random.default_rng(12)
        for _ in range(50):
            w = jnp.asarray(rng.uniform(-np.pi, np.pi, 3))
            R = SO3.exp(w)
            R2 = SO3.from_matrix(R.matrix())
            np.testing.assert_allclose(np.asarray(R2.matrix()),
                                       np.asarray(R.matrix()), atol=1e-10)

    def test_compose_inverse(self):
        R1 = SO3.exp(jnp.array([0.1, 0.2, 0.3]))
        R2 = SO3.exp(jnp.array([-0.4, 0.5, 0.6]))
        I = (R1 @ R2) @ (R1 @ R2).inverse()
        np.testing.assert_allclose(np.asarray(I.matrix()), np.eye(3),
                                   atol=1e-12)

    def test_jacfwd_at_identity_tangent(self):
        """AD through exp at δ=0 must be finite (the LM linearization)."""
        J = jax.jacfwd(lambda d: SO3.exp(d).wxyz)(jnp.zeros(3))
        assert bool(jnp.all(jnp.isfinite(J)))
        # d quat / d w at 0 = [0; I/2]
        np.testing.assert_allclose(np.asarray(J[1:, :]), np.eye(3) / 2.0,
                                   atol=1e-12)


class TestSE3:
    def test_exp_log_roundtrip(self):
        d = jnp.array([0.5, -1.0, 2.0, 0.3, -0.2, 0.7])
        np.testing.assert_allclose(np.asarray(SE3.exp(d).log()),
                                   np.asarray(d), atol=1e-10)

    def test_matrix_consistency(self):
        T = SE3.exp(jnp.array([0.5, -1.0, 2.0, 0.3, -0.2, 0.7]))
        p = jnp.array([1.0, -2.0, 0.5])
        ph = jnp.concatenate([p, jnp.ones(1)])
        np.testing.assert_allclose(np.asarray(T.apply(p)),
                                   np.asarray((T.matrix() @ ph)[:3]),
                                   atol=1e-12)

    def test_inverse_compose(self):
        T = SE3.exp(jnp.array([0.5, -1.0, 2.0, 0.3, -0.2, 0.7]))
        I = T @ T.inverse()
        np.testing.assert_allclose(np.asarray(I.log()), np.zeros(6),
                                   atol=1e-12)


class TestPosePrior:
    def test_se3_pose_prior(self):
        """Mirror of tests/sophus.cpp:27-46: minimize ‖log(prior⁻¹·x)‖."""
        rng = np.random.default_rng(3)
        prior_inv = SE3.exp(jnp.asarray(rng.uniform(-1, 1, 6)))

        def residuals(x: SE3):
            return (prior_inv @ x).log()

        x0 = SE3.exp(jnp.asarray(rng.uniform(-1, 1, 6)))
        pose, out = to.optimize(x0, residuals)
        assert bool(out.succeeded()) and bool(out.converged())
        err = jnp.linalg.norm((pose @ prior_inv).log())
        assert float(err) == pytest.approx(0.0, abs=1e-5)

    def test_so3_rotation_prior(self):
        rng = np.random.default_rng(4)
        target = SO3.exp(jnp.asarray(rng.uniform(-1, 1, 3)))

        def residuals(R: SO3):
            return (target.inverse() @ R).log()

        R, out = to.optimize(SO3.identity(jnp.float64), residuals)
        assert bool(out.converged())
        np.testing.assert_allclose(np.asarray(R.matrix()),
                                   np.asarray(target.matrix()), atol=1e-6)

    def test_pose_prior_covariance_is_identity(self):
        """The pose-prior residual has J ≈ I near convergence, so the
        posterior covariance is ≈ I₆ (cov semantics on manifolds)."""
        prior_inv = SE3.exp(jnp.asarray(np.linspace(-0.1, 0.1, 6)))
        pose, out = to.optimize(
            SE3.identity(jnp.float64),
            lambda x: (prior_inv @ x).log())
        C = out.covariance()
        np.testing.assert_allclose(np.asarray(C), np.eye(6), atol=1e-3)


class TestSE23:
    """Extended pose (rotation + velocity + position), the Lie++ SEn3<2>
    analogue (reference tests/lieplusplus.cpp)."""

    from tinyopt_tpu.manifolds import SE23

    def test_exp_log_roundtrip(self):
        from tinyopt_tpu.manifolds import SE23
        d = jnp.array([0.1, -0.2, 0.3, 0.5, -1.0, 2.0, 0.3, -0.2, 0.7])
        np.testing.assert_allclose(np.asarray(SE23.exp(d).log()),
                                   np.asarray(d), atol=1e-10)

    def test_inverse_compose(self):
        from tinyopt_tpu.manifolds import SE23
        X = SE23.exp(jnp.asarray(np.linspace(-0.5, 0.5, 9)))
        np.testing.assert_allclose(np.asarray((X @ X.inverse()).log()),
                                   np.zeros(9), atol=1e-12)

    def test_extended_pose_prior_optimization(self):
        from tinyopt_tpu.manifolds import SE23
        rng = np.random.default_rng(9)
        prior_inv = SE23.exp(jnp.asarray(rng.uniform(-0.8, 0.8, 9)))

        def residuals(x):
            return (prior_inv @ x).log()

        x, out = to.optimize(SE23.identity(jnp.float64), residuals)
        assert bool(out.converged())
        assert float(jnp.linalg.norm((x @ prior_inv).log())) < 1e-5

    def test_tangent_dims(self):
        from tinyopt_tpu import manifold as mf
        from tinyopt_tpu.manifolds import SE23
        assert mf.tangent_spec(SE23.identity()).dims == 9


class TestSE3RefinementModel:
    def test_batched_refinement_converges(self):
        """The flagship model (models/se3_refinement.py) on 32 instances."""
        from tinyopt_tpu.models.se3_refinement import (
            make_se3_refinement, se3_residual)
        from tinyopt_tpu.parallel.batched import batched_optimize

        data, x0, true_pose = make_se3_refinement(
            32, n_points=12, noise=0.0, dtype=jnp.float64, seed=7)
        x_opt, out = batched_optimize(x0, se3_residual, to.Options(),
                                      data_batch=data)
        assert bool(jnp.all(out.succeeded()))
        # Recovered poses match the ground truth (noise-free data)
        err_rot = jax.vmap(
            lambda a, b: jnp.linalg.norm(
                (SO3(a) @ SO3(b).inverse()).log()))(
            x_opt.rotation.wxyz, true_pose.rotation.wxyz)
        err_t = jnp.linalg.norm(x_opt.translation - true_pose.translation,
                                axis=-1)
        assert float(jnp.max(err_rot)) < 1e-5
        assert float(jnp.max(err_t)) < 1e-5


class TestSEn3:
    """Generic SEn3<n> (reference lieplusplus.h:17-53 supports any n;
    manifolds/sen3.py is the from-scratch equivalent)."""

    def test_exp_log_roundtrip_various_n(self):
        from tinyopt_tpu.manifolds import SEn3
        rng = np.random.default_rng(3)
        for n in (1, 2, 3, 4):
            d = jnp.asarray(rng.uniform(-1.0, 1.0, 3 * (n + 1)))
            np.testing.assert_allclose(np.asarray(SEn3.exp(d).log()),
                                       np.asarray(d), atol=1e-10)

    def test_matches_se23(self):
        """SEn3 with n=2 is SE23 with [ν, ρ] stacked into .vectors."""
        from tinyopt_tpu.manifolds import SE23, SEn3
        d = jnp.asarray(np.linspace(-0.7, 0.7, 9))
        a = SEn3.exp(d)
        b = SE23.exp(d)
        np.testing.assert_allclose(np.asarray(a.rotation.wxyz),
                                   np.asarray(b.rotation.wxyz), atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.vectors[..., 0, :]),
                                   np.asarray(b.velocity), atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.vectors[..., 1, :]),
                                   np.asarray(b.position), atol=1e-12)

    def test_inverse_compose_batched(self):
        from tinyopt_tpu.manifolds import SEn3
        rng = np.random.default_rng(5)
        d = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 12)))  # batch of SEn3<3>
        X = SEn3.exp(d)
        np.testing.assert_allclose(np.asarray((X @ X.inverse()).log()),
                                   np.zeros((4, 12)), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray((X.inverse() @ X).log()), np.zeros((4, 12)),
            atol=1e-12)

    def test_prior_optimization_n3(self):
        from tinyopt_tpu.manifolds import SEn3
        rng = np.random.default_rng(11)
        prior_inv = SEn3.exp(jnp.asarray(rng.uniform(-0.8, 0.8, 12)))

        def residuals(x):
            return (prior_inv @ x).log()

        x, out = to.optimize(SEn3.identity(3, jnp.float64), residuals)
        assert bool(out.converged())
        assert float(jnp.linalg.norm((x @ prior_inv).log())) < 1e-5

    def test_tangent_dims(self):
        from tinyopt_tpu import manifold as mf
        from tinyopt_tpu.manifolds import SEn3
        assert mf.tangent_spec(SEn3.identity(3)).dims == 12
        assert mf.tangent_spec(SEn3.identity(1, batch=(5,))).dims == 30
