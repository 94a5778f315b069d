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


class TestBucketedLayout:
    """K-bucketed point-major layout for heavy-tailed visibility
    (VERDICT r3 missing #2): published BAL counts are power-law (mean
    ~6, max in the hundreds) — one (n_pts, K_max) slab inflates 10-50x.
    Spec: the bucketed system is the SAME algebra (trajectory parity
    with the single slab), the loader buckets directly from the
    observation triplets, and total padded slots stay within ~2x the
    observation count regardless of the densest landmark."""

    FIXTURE = __file__.rsplit("/", 1)[0] + "/data/bal_excerpt.txt"

    def _heavy_tail_instance(self, seed=4):
        """Synthetic heavy-tail instance via the padded layout."""
        (obs, cam_idx, mask), x0, xt, _ = make_bal_problem(
            n_cams=10, n_pts=90, k_obs=8, noise=0.3, seed=seed)
        # thin most landmarks down to 2-3 obs, keep a dense tail
        rng = np.random.default_rng(seed)
        m = np.array(mask)
        for j in range(70):
            keep = rng.integers(2, 4)
            m[j, keep:] = 0.0
        return (obs, jnp.asarray(np.where(m > 0, np.asarray(cam_idx), 0)),
                jnp.asarray(m)), x0

    def test_bucket_obs_partitions_and_bounds_padding(self):
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        (obs, cam_idx, mask), _ = self._heavy_tail_instance()
        slabs = bucket_obs(obs, cam_idx, mask, min_bucket=8)
        ids_all = np.concatenate([np.asarray(s[3]) for s in slabs])
        assert sorted(ids_all.tolist()) == list(range(90))
        n_obs = int(np.asarray(mask).sum())
        slots = sum(int(np.asarray(s[1]).size) for s in slabs)
        assert slots <= 2.5 * n_obs + 8 * 8, (slots, n_obs)
        # observations preserved exactly
        total = sum(float(np.asarray(s[2]).sum()) for s in slabs)
        assert total == n_obs

    def test_bucketed_solve_matches_single_slab(self):
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        (obs, cam_idx, mask), x0 = self._heavy_tail_instance()
        o = to.Options(max_iters=8, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False))
        (cams_1, pts_1), out_1 = to.schur_sparse_optimize(
            x0, bal_residual, obs, cam_idx, mask, o)
        slabs = bucket_obs(obs, cam_idx, mask, min_bucket=8)
        assert len(slabs) >= 2          # the tail actually split
        (cams_b, pts_b), out_b = to.schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, o)
        np.testing.assert_allclose(np.asarray(pts_b), np.asarray(pts_1),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(cams_b["pose"].translation),
            np.asarray(cams_1["pose"].translation), rtol=1e-6, atol=1e-8)
        assert int(out_b.final_cost.num_residuals) == int(
            out_1.final_cost.num_residuals)
        assert int(out_b.num_iters) == int(out_1.num_iters)

    @pytest.mark.parametrize("solver", [to.LevenbergMarquardt, to.DogLeg])
    def test_bucketed_solvers_converge(self, solver):
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        (obs, cam_idx, mask), x0 = self._heavy_tail_instance()
        slabs = bucket_obs(obs, cam_idx, mask, min_bucket=8)
        o = to.Options(max_iters=15, max_consec_failures=0,
                       solver_type=solver,
                       hessian=to.HessianOptions(save_last=False))
        (cams, pts), out = to.schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, o)
        assert bool(out.succeeded())
        rmse = float(bal_rmse(cams, pts, obs, cam_idx, mask))
        assert rmse < 0.45, rmse       # noise is 0.3 px

    def test_fixture_loads_and_converges(self):
        """The committed real-format heavy-tail excerpt: loads in both
        layouts, bucketing bounds padding, and the bucketed solve
        converges to the sub-pixel noise floor (0.5 px)."""
        (obs, cam_idx, mask), x0p = load_bal(self.FIXTURE)
        slabs, x0 = load_bal(self.FIXTURE, layout="bucketed",
                             min_bucket=32)
        n_obs = int(np.asarray(mask).sum())
        padded_slots = int(np.asarray(mask).size)
        slots = sum(int(np.asarray(s[1]).size) for s in slabs)
        assert padded_slots > 3.5 * n_obs      # the heavy tail is real
        assert slots < 0.6 * padded_slots, (slots, padded_slots)
        assert slots < 2.2 * n_obs + 32 * 30, (slots, n_obs)
        ids_all = np.concatenate([np.asarray(s[3]) for s in slabs])
        assert sorted(ids_all.tolist()) == list(range(600))

        # perturb and re-solve to the noise floor; fixture noise 0.5 px
        rng = np.random.default_rng(0)
        x0_p = ({"pose": x0[0]["pose"], "intr": x0[0]["intr"]},
                x0[1] + jnp.asarray(
                    rng.normal(0.0, 5e-3, x0[1].shape)))
        o = to.Options(max_iters=20, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False))
        (cams, pts), out = to.schur_sparse_optimize_buckets(
            x0_p, bal_residual, slabs, o)
        assert bool(out.succeeded())
        rmse = float(bal_rmse(cams, pts, obs, cam_idx, mask))
        assert rmse < 0.55, rmse


class TestPlannedReduce:
    def test_randomized_vs_scatter_oracle(self):
        """make_planned_segment_reduce == np.add.at across skewed /
        uniform / degenerate id distributions (the r4 bucket_caps
        down-merge truncation bug is pinned by the skewed cases)."""
        from tinyopt_tpu.ops.schur_obs import make_planned_segment_reduce
        rng = np.random.default_rng(0)
        for trial in range(12):
            n_rows = int(rng.integers(10, 3000))
            n_out = int(rng.integers(2, 200))
            skew = rng.random()
            ids = np.where(rng.random(n_rows) < skew,
                           rng.integers(0, max(n_out // 10, 1)),
                           rng.integers(0, n_out, n_rows))
            vals = rng.normal(size=(n_rows, 3))
            ref = np.zeros((n_out, 3))
            np.add.at(ref, ids, vals)
            out = np.asarray(make_planned_segment_reduce(ids, n_out)(
                jnp.asarray(vals)))
            assert np.abs(out - ref).max() < 1e-10, trial

    def test_single_segment(self):
        from tinyopt_tpu.ops.schur_obs import make_planned_segment_reduce
        vals = jnp.asarray(np.arange(12.0).reshape(6, 2))
        out = make_planned_segment_reduce(np.zeros(6, np.int64), 3)(vals)
        np.testing.assert_allclose(np.asarray(out)[0],
                                   np.asarray(vals).sum(0))
        np.testing.assert_allclose(np.asarray(out)[1:], 0.0)

    def test_merge_cascade_staging_bounded(self):
        """The r5 ceiling regression: a thin tail of 1-row segments
        plus one huge pad segment made the min_class merge CASCADE —
        thousands of tiny segments inherited the outlier's cap (50k
        rows staged to 78M slots = a 40 GB gather at the 4000-camera
        ceiling).  bucket_caps merges are now budgeted: total padded
        slots must stay <= max_blowup x the unmerged total, and the
        planned reduce stays exact."""
        from tinyopt_tpu.ops.schur_obs import (bucket_caps,
                                               make_planned_segment_reduce)
        # ~32k singleton segments + one 18k-row outlier (the fin_band
        # shape of the 4000-cam ceiling, scaled down 4x)
        n_seg, outlier = 8000, 4500
        ids = np.concatenate([np.arange(1, n_seg + 1),
                              np.zeros(outlier, np.int64)])
        counts = np.bincount(ids)
        cap_of, used = bucket_caps(counts[counts > 0], growth=1.35,
                                   min_bucket=8)
        staged = int(sum(int((cap_of == c).sum()) * int(c)
                         for c in used))
        assert staged <= 2 * ids.size + 8 * n_seg, staged
        # exactness unchanged
        vals = np.random.default_rng(0).normal(size=(ids.size, 3))
        ref = np.zeros((n_seg + 1, 3))
        np.add.at(ref, ids, vals)
        out = np.asarray(make_planned_segment_reduce(ids, n_seg + 1)(
            jnp.asarray(vals)))
        assert np.abs(out - ref).max() < 1e-10


class TestShardedBuckets:
    """Landmark-sharded K-bucketed BA (parallel/schur_obs.py r4): the
    heavy-tail layout composed with the mesh.  Spec: f64 trajectory
    parity with the single-device bucketed entry (same algebra up to
    psum order), including buckets smaller than the mesh axis."""

    def _instance(self, seed=4):
        (obs, cam_idx, mask), x0, _, _ = make_bal_problem(
            n_cams=10, n_pts=90, k_obs=8, noise=0.3, seed=seed)
        rng = np.random.default_rng(seed)
        m = np.array(mask)
        for j in range(70):
            m[j, rng.integers(2, 4):] = 0.0
        return (obs, jnp.asarray(np.where(m > 0, np.asarray(cam_idx),
                                          0)),
                jnp.asarray(m)), x0

    @pytest.mark.parametrize("solver", [to.LevenbergMarquardt, to.DogLeg])
    def test_matches_single_device(self, solver):
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        from tinyopt_tpu.parallel import (
            sharded_schur_sparse_optimize_buckets)
        (obs, cam_idx, mask), x0 = self._instance()
        slabs = bucket_obs(obs, cam_idx, mask, min_bucket=8)
        assert len(slabs) >= 2
        o = to.Options(max_iters=8, max_consec_failures=0,
                       solver_type=solver,
                       hessian=to.HessianOptions(save_last=False))
        (c1, p1), out1 = to.schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, o)
        (c2, p2), out2 = sharded_schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, o)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(c2["pose"].translation),
            np.asarray(c1["pose"].translation), rtol=1e-7, atol=1e-9)
        assert int(out2.num_iters) == int(out1.num_iters)
        assert int(out2.stop_reason) == int(out1.stop_reason)

    def test_bucket_smaller_than_mesh(self):
        """A 3-landmark bucket over the 8-device mesh pads internally
        with mask-0 rows (zero contributions) and still matches."""
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        from tinyopt_tpu.parallel import (
            sharded_schur_sparse_optimize_buckets)
        (obs, cam_idx, mask), x0, _, _ = make_bal_problem(
            n_cams=10, n_pts=90, k_obs=8, noise=0.3, seed=4)
        m = np.array(mask)
        m[3:, 3:] = 0.0               # rows 0-2 dense (8 obs), rest 3
        cam_idx = jnp.asarray(np.where(m > 0, np.asarray(cam_idx), 0))
        mask2 = jnp.asarray(m)
        slabs = bucket_obs(obs, cam_idx, mask2, min_bucket=2)
        assert any(len(np.asarray(s[3])) < 8 for s in slabs)
        o = to.Options(max_iters=6, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False))
        (c1, p1), out1 = to.schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, o)
        (c2, p2), out2 = sharded_schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, o)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   rtol=1e-7, atol=1e-9)
        assert int(out2.num_iters) == int(out1.num_iters)


class TestBucketFuzz:
    """Randomized heavy-tail layouts: bucketed == single-slab
    trajectories across visibility distributions (guards bucket_caps /
    slot compaction / the planned reduce end-to-end)."""

    @pytest.mark.parametrize("seed", [11, 12, 13])
    def test_random_heavy_tail_parity(self, seed):
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        rng = np.random.default_rng(seed)
        (obs, cam_idx, mask), x0, _, _ = make_bal_problem(
            n_cams=8, n_pts=70, k_obs=8, noise=0.3, seed=seed)
        m = np.array(mask)
        for j in range(70):
            keep = int(np.clip(rng.zipf(1.8), 1, 8))
            m[j, keep:] = 0.0
        cam_idx = jnp.asarray(np.where(m > 0, np.asarray(cam_idx), 0))
        mask = jnp.asarray(m)
        slabs = bucket_obs(obs, cam_idx, mask,
                           min_bucket=int(rng.integers(2, 12)))
        ids_all = np.concatenate([np.asarray(s[3]) for s in slabs])
        assert sorted(ids_all.tolist()) == list(range(70))
        o = to.Options(max_iters=6, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False))
        (c1, p1), out1 = to.schur_sparse_optimize(
            x0, bal_residual, obs, cam_idx, mask, o)
        (c2, p2), out2 = to.schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, o)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                                   rtol=1e-6, atol=1e-8)
        assert int(out2.num_iters) == int(out1.num_iters)
