"""ICP point-cloud registration (models/icp.py).

No reference counterpart (its manifold coverage stops at pose priors,
tests/sophus.cpp); this is the model family those blocks exist for —
unknown correspondences, alternation compiled into ONE XLA program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.models.icp import icp, make_icp_problem, nearest_neighbors


def _pose_err(pose, true_pose):
    return float(jnp.linalg.norm((pose @ true_pose.inverse()).log()))


class TestNearestNeighbors:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.uniform(-1, 1, (20, 3)))
        dst = jnp.asarray(rng.uniform(-1, 1, (30, 3)))
        idx = np.asarray(nearest_neighbors(src, dst))
        d = np.linalg.norm(np.asarray(src)[:, None] -
                           np.asarray(dst)[None], axis=-1)
        np.testing.assert_array_equal(idx, d.argmin(axis=1))


class TestICP:
    def test_clean_registration(self):
        """Unknown correspondences, identity start, exact recovery."""
        prob = make_icp_problem(n_src=96, n_dst=128, noise=1e-4, seed=0)
        pose, out = jax.jit(lambda s, d: icp(s, d))(prob.src, prob.dst)
        assert bool(out.succeeded())
        assert _pose_err(pose, prob.true_pose) < 1e-3

    def test_robust_beats_plain_under_outliers(self):
        """15% gross outliers: Huber-whitened point distances recover the
        pose; plain least squares is dragged far off."""
        prob = make_icp_problem(n_src=96, n_dst=128, noise=1e-3,
                                outlier_frac=0.15, seed=1)
        run = lambda **kw: jax.jit(
            lambda s, d: icp(s, d, n_outer=15, **kw))(prob.src, prob.dst)
        pose_r, _ = run(robust_th=0.1)
        pose_p, _ = run()
        err_r = _pose_err(pose_r, prob.true_pose)
        err_p = _pose_err(pose_p, prob.true_pose)
        assert err_r < 0.02
        assert err_r < err_p / 10

    def test_batched_vmap(self):
        """Thousands-of-cloud-pairs regime: one vmapped XLA program."""
        prob = make_icp_problem(batch=8, n_src=64, n_dst=80, noise=1e-4,
                                seed=2)
        poses, outs = jax.jit(jax.vmap(lambda s, d: icp(s, d)))(
            prob.src, prob.dst)
        errs = jax.vmap(
            lambda p, t: jnp.linalg.norm((p @ t.inverse()).log()))(
                poses, prob.true_pose)
        assert float(errs.max()) < 1e-3
        assert bool(outs.succeeded().all())

    def test_multi_start_escapes_local_minimum(self):
        """A far pose that identity-start ICP cannot reach: multi-start
        picks the basin with the lowest final cost."""
        from tinyopt_tpu.models.icp import icp_multi_start
        prob = make_icp_problem(n_src=80, n_dst=100, noise=1e-4,
                                pose_scale=1.2, seed=7)
        pose1, out1 = jax.jit(lambda s, d: icp(s, d, n_outer=12))(
            prob.src, prob.dst)
        posem, outm = jax.jit(
            lambda s, d: icp_multi_start(s, d, n_starts=12, n_outer=12,
                                         spread=1.0))(prob.src, prob.dst)
        assert float(outm.final_cost.cost) <= float(out1.final_cost.cost)
        assert _pose_err(posem, prob.true_pose) < 0.02

    def test_custom_options_and_start(self):
        from tinyopt_tpu.manifolds import SE3
        prob = make_icp_problem(n_src=64, n_dst=80, noise=1e-4, seed=3)
        pose, out = icp(prob.src, prob.dst,
                        pose0=SE3.identity(prob.src.dtype),
                        options=to.Options(solver_type=to.GaussNewton,
                                           max_iters=6,
                                           max_consec_failures=0),
                        n_outer=8)
        assert _pose_err(pose, prob.true_pose) < 1e-3
