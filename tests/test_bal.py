"""BAL 9-parameter camera model (models/bal.py): projection semantics,
loader round-trip, full solves on the Schur paths (the multi-leaf
per-camera pytree pins the element-major <-> leaf-major tangent layout
adapter, ops/schur.bipartite_perms), and GNC outlier recovery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tinyopt_tpu as to
from tinyopt_tpu import manifold as mf
from tinyopt_tpu.manifolds import SE3, SO3
from tinyopt_tpu.models.bal import (bal_project, bal_residual, bal_rmse,
                                    cameras_from_bal, cameras_to_bal,
                                    load_bal, make_bal_problem, write_bal)


class TestCameraModel:
    def test_projection_analytic(self):
        """Identity pose, point on axis at z=-2: p = (x, y)/2 before
        distortion; check the full distortion polynomial by hand."""
        cam = {"pose": SE3(SO3(jnp.asarray([1.0, 0, 0, 0])),
                           jnp.zeros(3)),
               "intr": jnp.asarray([100.0, 0.1, 0.01])}
        pt = jnp.asarray([0.4, -0.2, -2.0])
        p = np.asarray([0.2, -0.1])               # -P[:2]/z
        n2 = float((p ** 2).sum())
        r = 1.0 + 0.1 * n2 + 0.01 * n2 * n2
        np.testing.assert_allclose(np.asarray(bal_project(cam, pt)),
                                   100.0 * r * p, rtol=1e-12)

    def test_rotation_roundtrip(self):
        """Angle-axis <-> quaternion conversions are mutual inverses,
        including near theta=0."""
        rng = np.random.default_rng(0)
        aa = np.concatenate([rng.normal(size=(20, 3)),
                             1e-14 * rng.normal(size=(3, 3)),
                             np.zeros((1, 3))])
        p9 = np.concatenate([aa, np.zeros((24, 6))], axis=1)
        cams = cameras_from_bal(p9)
        back = cameras_to_bal(cams)
        np.testing.assert_allclose(back[:, :3], aa, atol=1e-12)
        # the quaternion itself rotates like SO3.exp of the same vector
        q_ref = jax.vmap(lambda w: SO3.exp(w).wxyz)(jnp.asarray(aa))
        q = np.asarray(cams["pose"].rotation.wxyz)
        q_ref = np.asarray(q_ref)
        flip = np.minimum(np.abs(q - q_ref).max(1),
                          np.abs(q + q_ref).max(1))
        assert flip.max() < 1e-12

    def test_loader_roundtrip(self, tmp_path):
        (obs, cam_idx, mask), x0, xt, _ = make_bal_problem(
            n_cams=6, n_pts=40, k_obs=3, noise=0.1, seed=1)
        path = str(tmp_path / "prob.txt")
        write_bal(path, xt[0], xt[1], obs, cam_idx, mask)
        (obs2, cam2, mask2), x2 = load_bal(path)
        np.testing.assert_allclose(np.asarray(obs2), np.asarray(obs),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(cam2),
                                      np.asarray(cam_idx))
        np.testing.assert_array_equal(np.asarray(mask2),
                                      np.asarray(mask))
        np.testing.assert_allclose(np.asarray(x2[1]), np.asarray(xt[1]),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(x2[0]["intr"]),
                                   np.asarray(xt[0]["intr"]), atol=1e-12)
        q1 = np.asarray(x2[0]["pose"].rotation.wxyz)
        q0 = np.asarray(xt[0]["pose"].rotation.wxyz)
        assert np.minimum(np.abs(q1 - q0).max(1),
                          np.abs(q1 + q0).max(1)).max() < 1e-12

    def test_loader_bz2_and_k_cap(self, tmp_path):
        import bz2
        (obs, cam_idx, mask), x0, xt, _ = make_bal_problem(
            n_cams=5, n_pts=20, k_obs=3, seed=2)
        path = str(tmp_path / "prob.txt")
        write_bal(path, xt[0], xt[1], obs, cam_idx, mask)
        bz = str(tmp_path / "prob.txt.bz2")
        with open(path, "rb") as f, bz2.open(bz, "wb") as g:
            g.write(f.read())
        (obs2, _, _), _ = load_bal(bz)
        np.testing.assert_allclose(np.asarray(obs2), np.asarray(obs),
                                   atol=1e-12)
        with pytest.raises(ValueError, match="densest"):
            load_bal(path, K=2)


def _dense_H_oracle(x0, obs, cam_idx, mask):
    """Independent H = JᵀJ in the LOOP's global tangent layout."""
    spec = mf.tangent_spec(x0)

    def res(x):
        cams, pts = x

        def point(pt, d_j, cams_j, m_j):
            def one(c, d_k, m_k):
                cam = jax.tree_util.tree_map(lambda l: l[c], cams)
                return bal_residual(cam, pt, d_k) * m_k
            return jax.vmap(one)(cams_j, d_j, m_j)

        return jax.vmap(point)(pts, obs, cam_idx, mask).reshape(-1)

    from tinyopt_tpu.diff.auto import residual_jacobian
    r, J = residual_jacobian(res, x0, spec)
    return J.T @ J, J.T @ r


class TestMultiLeafLayout:
    """The BAL camera pytree {"pose": SE3, "intr": (3,)} makes the
    element-major Schur layout differ from the loop's leaf-major global
    layout — these tests pin the bipartite_perms adapter against an
    independent dense-AD oracle."""

    def _instance(self):
        (obs, cam_idx, mask), x0, _, _ = make_bal_problem(
            n_cams=5, n_pts=24, k_obs=3, noise=0.1, seed=4)
        return obs, cam_idx, mask, x0

    def test_H_and_g_match_dense_oracle(self):
        from tinyopt_tpu.ops.schur_obs import schur_obs_system
        obs, cam_idx, mask, x0 = self._instance()
        spec = mf.tangent_spec(x0)
        acc, ev, n_res, propose = schur_obs_system(
            bal_residual, x0[0], x0[1], obs, cam_idx, mask, spec)
        H, g, cost = jax.jit(acc)(x0)
        H_ref, g_ref = _dense_H_oracle(x0, obs, cam_idx, mask)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(H.to_dense()),
                                   np.asarray(H_ref),
                                   rtol=1e-8, atol=1e-8)
        v = jnp.asarray(np.random.default_rng(0).normal(size=(spec.dims,)))
        np.testing.assert_allclose(np.asarray(H.matvec(v)),
                                   np.asarray(H_ref @ v),
                                   rtol=1e-8, atol=1e-8)

    def test_grid_system_matches_dense_oracle(self):
        from tinyopt_tpu.ops.schur import schur_system
        obs, cam_idx, mask, x0 = self._instance()
        n_a = 5
        n_b = int(np.asarray(cam_idx).shape[0])
        grid = np.zeros((n_a, n_b, 2))
        gmask = np.zeros((n_a, n_b))
        ci, ob, mk = (np.asarray(cam_idx), np.asarray(obs),
                      np.asarray(mask))
        for j in range(n_b):
            for k in range(ci.shape[1]):
                if mk[j, k]:
                    gmask[ci[j, k], j] = 1.0
                    grid[ci[j, k], j] = ob[j, k]
        spec = mf.tangent_spec(x0)
        acc, *_ = schur_system(bal_residual, x0[0], x0[1],
                               jnp.asarray(grid), jnp.asarray(gmask), spec)
        H, g, _ = jax.jit(acc)(x0)
        H_ref, g_ref = _dense_H_oracle(x0, obs, cam_idx, mask)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(H.to_dense()),
                                   np.asarray(H_ref),
                                   rtol=1e-8, atol=1e-8)
        # covariance block inversion in the global layout
        cov = np.asarray(H.inv().to_dense())
        lam = 1e-9 * np.eye(spec.dims)      # gauge: H is singular
        Hd = np.asarray(H_ref)
        # compare H @ cov on the regularized system instead: use a
        # well-conditioned damped copy for an exact check
        from tinyopt_tpu.ops.schur import SchurSystem, _damp_blocks
        Hd_sys = SchurSystem(_damp_blocks(H.Ba, 1.0),
                             _damp_blocks(H.C, 1.0), H.E,
                             H.em2gl, H.gl2em)
        cov_d = np.asarray(Hd_sys.inv().to_dense())
        np.testing.assert_allclose(
            cov_d @ np.asarray(Hd_sys.to_dense()), np.eye(spec.dims),
            atol=1e-6)


class TestBALSolve:
    @pytest.mark.parametrize("solver", [to.LevenbergMarquardt, to.DogLeg])
    def test_converges_below_noise(self, solver):
        (obs, cam_idx, mask), x0, _, _ = make_bal_problem(
            n_cams=12, n_pts=120, k_obs=4, noise=0.5, seed=2)
        o = to.Options(max_iters=20, max_consec_failures=0,
                       solver_type=solver,
                       hessian=to.HessianOptions(save_last=False))
        (cams, pts), out = to.schur_sparse_optimize(
            x0, bal_residual, obs, cam_idx, mask, o)
        rmse = float(bal_rmse(cams, pts, obs, cam_idx, mask))
        assert rmse < 0.6, rmse            # noise is 0.5 px

    def test_grid_matches_sparse_obs_trajectory(self):
        (obs, cam_idx, mask), x0, _, _ = make_bal_problem(
            n_cams=8, n_pts=60, k_obs=3, noise=0.2, seed=3)
        o = to.Options(max_iters=10, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False))
        (cams_s, pts_s), out_s = to.schur_sparse_optimize(
            x0, bal_residual, obs, cam_idx, mask, o)
        n_a, n_b = 8, 60
        grid = np.zeros((n_a, n_b, 2))
        gmask = np.zeros((n_a, n_b))
        ci, ob, mk = (np.asarray(cam_idx), np.asarray(obs),
                      np.asarray(mask))
        for j in range(n_b):
            for k in range(ci.shape[1]):
                if mk[j, k]:
                    gmask[ci[j, k], j] = 1.0
                    grid[ci[j, k], j] = ob[j, k]
        (cams_g, pts_g), out_g = to.schur_optimize(
            x0, bal_residual, jnp.asarray(grid), jnp.asarray(gmask), o)
        np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_g),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(cams_s["intr"]),
                                   np.asarray(cams_g["intr"]),
                                   rtol=1e-6, atol=1e-8)
        assert int(out_s.num_iters) == int(out_g.num_iters)
        assert int(out_s.stop_reason) == int(out_g.stop_reason)

    def test_sharded_matches_unsharded(self):
        from tinyopt_tpu.parallel import (local_mesh,
                                          sharded_schur_sparse_optimize)
        (obs, cam_idx, mask), x0, _, _ = make_bal_problem(
            n_cams=8, n_pts=64, k_obs=3, noise=0.2, seed=3)
        o = to.Options(max_iters=10, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False))
        x_ref, out_ref = to.schur_sparse_optimize(
            x0, bal_residual, obs, cam_idx, mask, o)
        x_sh, out_sh = sharded_schur_sparse_optimize(
            x0, bal_residual, obs, cam_idx, mask, o,
            mesh=local_mesh("block"))
        np.testing.assert_allclose(np.asarray(x_sh[1]),
                                   np.asarray(x_ref[1]),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(x_sh[0]["intr"]),
                                   np.asarray(x_ref[0]["intr"]),
                                   rtol=1e-7, atol=1e-9)
        assert int(out_sh.num_iters) == int(out_ref.num_iters)
        assert int(out_sh.stop_reason) == int(out_ref.stop_reason)


class TestBALRobust:
    def test_gnc_recovers_inlier_geometry(self):
        """15% gross outliers: GNC recovers the determined landmarks to
        oracle accuracy; plain L2 is wrecked.  Landmarks with <2 clean
        observations are excluded (underdetermined by construction —
        a saturating loss legitimately lets them escape)."""
        from tinyopt_tpu.losses import (geman_mcclure, gnc_anneal,
                                        gnc_schedule, robust_whiten)
        kw = dict(n_cams=12, n_pts=120, k_obs=4, noise=0.5, seed=5)
        (obs_c, ci, mk), x0, xt, _ = make_bal_problem(
            outlier_frac=0.0, **kw)
        (obs_o, _, _), _, _, bad = make_bal_problem(
            outlier_frac=0.15, **kw)
        bad = np.asarray(bad)
        determined = (bad.shape[1] - bad.sum(1)) >= 2
        good_slot = jnp.asarray(
            (~bad) & determined[:, None], obs_c.dtype)
        o = to.Options(max_iters=30, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False))

        def inlier_rmse(x):
            # clean obs, uncorrupted slots, determined landmarks only
            return float(bal_rmse(x[0], x[1], obs_c, ci,
                                  jnp.asarray(mk) * good_slot))

        x_oracle, _ = to.schur_sparse_optimize(
            x0, bal_residual, obs_c, ci, mk, o)
        e_oracle = inlier_rmse(x_oracle)

        x_plain, _ = to.schur_sparse_optimize(
            x0, bal_residual, obs_o, ci, mk, o)
        e_plain = inlier_rmse(x_plain)

        def stage(x, th2):
            def rp(cam, pt, ob):
                return robust_whiten(bal_residual(cam, pt, ob),
                                     geman_mcclure, th2)
            return to.schur_sparse_optimize(x, rp, obs_o, ci, mk, o)

        x_gnc, out = gnc_anneal(stage, x0,
                                gnc_schedule(50.0, 2.0, steps=5))
        e_gnc = inlier_rmse(x_gnc)
        assert e_plain > 10 * e_oracle, (e_plain, e_oracle)
        assert e_gnc < 1.2 * e_oracle, (e_gnc, e_oracle)
