"""Covariance at scale (VERDICT r3 #1).

The reference exposes ``Covariance()`` on every solver it has
(/root/reference/include/tinyopt/solvers/gn.h:186, output.h:80-93,
math.h:88-189) by densifying H.  The scale paths here cannot densify
(156k² at the BA flagship), so they expose MARGINAL covariance blocks:

* sparse-obs BA: per-camera blocks = S⁻¹'s diagonal (marginalizing
  landmarks IS the Schur complement) + per-landmark blocks
  C⁻¹ + C⁻¹EᵀS⁻¹EC⁻¹ (``schur_sparse_covariance``, sharded variant);
* chain graphs: per-pose blocks by the Takahashi selected-inverse
  recursion off the block-tridiagonal factor with the Woodbury
  loop-closure downdate (``chain_marginals``).

Spec: f64 parity against the dense ``inv_cov(H)`` the small-scale paths
compute, including ``rescaled`` semantics (output.h:80-93).  The test
instances are WELL-POSED (generic random observation maps / anchored
chains) — covariance of the undamped H requires a fixed gauge, and the
singular case must surface as NaN, which the last test pins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu import manifold as mf
from tinyopt_tpu.ops.linalg import cov_rescale, inv_cov


# ----------------------------------------------------------------------
# Sparse-observation bipartite instance: multi-leaf camera pytree
# (exercises the em<->gl layout perms), generic random observation maps
# (H is PD with probability 1 — no gauge null space).
# ----------------------------------------------------------------------
N_A, N_B, K, M = 5, 24, 3, 4          # da = 3 (2+1), db = 2


def pair_fn(a, b, d):
    av = jnp.concatenate([a["u"], a["v"]])
    return d["A"] @ av + d["B"] @ b - d["y"]


def _obs_instance(seed=3, n_a=N_A, n_b=N_B):
    rng = np.random.default_rng(seed)
    a = {"u": jnp.asarray(rng.normal(size=(n_a, 2))),
         "v": jnp.asarray(rng.normal(size=(n_a, 1)))}
    b = jnp.asarray(rng.normal(size=(n_b, 2)))
    obs = {"A": jnp.asarray(rng.normal(size=(n_b, K, M, 3))),
           "B": jnp.asarray(rng.normal(size=(n_b, K, M, 2))),
           "y": jnp.asarray(rng.normal(size=(n_b, K, M)))}
    cam_idx = jnp.asarray(rng.integers(0, n_a, size=(n_b, K)), jnp.int32)
    mask = jnp.asarray((rng.random((n_b, K)) < 0.8), jnp.float64)
    # every landmark needs >= 1 observation (C_j must be PD)
    mask = mask.at[:, 0].set(1.0)
    return (a, b), obs, cam_idx, mask


def _em_dense_cov(H):
    """Dense covariance of the system, in ELEMENT-MAJOR layout (undo
    to_dense's em->gl map: H_gl = H_em[em2gl][:, em2gl], so
    cov_em[p, q] = cov_gl[gl2em[p], gl2em[q]])."""
    cov_gl = np.asarray(inv_cov(H.to_dense()))
    assert np.all(np.isfinite(cov_gl)), "test instance must be PD"
    if H.gl2em is None:
        return cov_gl
    g2e = np.asarray(H.gl2em)
    return cov_gl[np.ix_(g2e, g2e)]


class TestSchurObsMarginals:
    def _system_at(self, x, obs, cam_idx, smask, chunk=8):
        from tinyopt_tpu.ops.schur_obs import schur_obs_system
        spec = mf.tangent_spec(x)
        acc, *_ = schur_obs_system(pair_fn, x[0], x[1], obs, cam_idx,
                                   smask, spec, chunk=chunk)
        H, g, cost = jax.jit(acc)(x)
        return H, cost, spec

    def test_marginals_match_dense_inverse(self):
        """obs_marginals == the diagonal blocks of inv_cov(dense H);
        multi-leaf camera pytree exercises the layout perms."""
        x, obs, cam_idx, smask = _obs_instance()
        H, _, _ = self._system_at(x, obs, cam_idx, smask)
        assert H.em2gl is not None      # the perms are exercised
        n_a, da, _ = H.Ba.shape
        n_b = H.C.shape[0]
        db = int(round(np.sqrt(H.C.shape[1])))
        cov_em = _em_dense_cov(H)

        cov_a, cov_b = jax.jit(lambda h: h.marginals(chunk=8))(H)
        for i in range(n_a):
            np.testing.assert_allclose(
                np.asarray(cov_a)[i],
                cov_em[i * da:(i + 1) * da, i * da:(i + 1) * da],
                rtol=1e-8, atol=1e-11)
        off = n_a * da
        for j in range(n_b):
            np.testing.assert_allclose(
                np.asarray(cov_b)[j],
                cov_em[off + j * db:off + (j + 1) * db,
                       off + j * db:off + (j + 1) * db],
                rtol=1e-8, atol=1e-11)

    def test_entry_point_and_rescale(self):
        """schur_sparse_covariance == system marginals; rescaled applies
        exactly cost²/(n_res − dims) (output.h:80-93)."""
        x, obs, cam_idx, smask = _obs_instance()
        H, cost, spec = self._system_at(x, obs, cam_idx, smask)
        cov_a0, cov_b0 = jax.jit(lambda h: h.marginals(chunk=8))(H)

        cov_a, cov_b = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8)
        np.testing.assert_allclose(np.asarray(cov_a), np.asarray(cov_a0),
                                   rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(np.asarray(cov_b), np.asarray(cov_b0),
                                   rtol=1e-10, atol=1e-13)

        cov_ar, _ = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8, rescaled=True)
        f = float(cov_rescale(cost.cost, cost.num_residuals, spec.dims))
        np.testing.assert_allclose(np.asarray(cov_ar),
                                   np.asarray(cov_a0) * f,
                                   rtol=1e-10, atol=1e-13)

    def test_output_covariance_via_inv(self):
        """Output.covariance() on a schur_sparse solve (save_last) ==
        dense inv_cov — the small-n compat path through
        SchurObsSystem.inv()."""
        x, obs, cam_idx, smask = _obs_instance()
        o = to.Options(max_iters=8, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=True))
        x_s, out = to.schur_sparse_optimize(x, pair_fn, obs, cam_idx,
                                            smask, o)
        assert bool(out.succeeded())
        cov = out.covariance()
        assert cov is not None
        ref = inv_cov(out.final_hessian.to_dense())
        np.testing.assert_allclose(np.asarray(cov), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)

    def test_sharded_matches_single_device(self):
        """sharded_schur_sparse_covariance over the 8-device mesh ==
        the single-device marginals (psum completion is exact)."""
        from tinyopt_tpu.parallel import sharded_schur_sparse_covariance
        x, obs, cam_idx, smask = _obs_instance(n_a=4, n_b=32)
        cov_a0, cov_b0 = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8)
        cov_a, cov_b = sharded_schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8)
        np.testing.assert_allclose(np.asarray(cov_a), np.asarray(cov_a0),
                                   rtol=1e-8, atol=1e-11)
        np.testing.assert_allclose(np.asarray(cov_b), np.asarray(cov_b0),
                                   rtol=1e-8, atol=1e-11)

        cov_ar, cov_br = sharded_schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8, rescaled=True)
        cov_ar0, cov_br0 = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8, rescaled=True)
        np.testing.assert_allclose(np.asarray(cov_ar),
                                   np.asarray(cov_ar0),
                                   rtol=1e-8, atol=1e-11)
        np.testing.assert_allclose(np.asarray(cov_br),
                                   np.asarray(cov_br0),
                                   rtol=1e-8, atol=1e-11)


class TestSelectedInverse:
    def test_matches_dense_inverse(self):
        """Takahashi diag blocks == dense inverse's diag blocks on a
        random SPD block-tridiagonal system."""
        from tinyopt_tpu.ops.tridiag import (block_tridiag_factor,
                                             block_tridiag_selected_inverse)
        rng = np.random.default_rng(0)
        N, d = 9, 4
        B = jnp.asarray(rng.normal(size=(N - 1, d, d)) * 0.3)
        D = jnp.asarray(
            np.stack([np.eye(d) * (3.0 + i) + 0.2 * rng.normal(size=(d, d))
                      for i in range(N)]))
        D = 0.5 * (D + jnp.swapaxes(D, -1, -2)) + 2.0 * jnp.eye(d)
        Hd = np.zeros((N * d, N * d))
        for i in range(N):
            Hd[i * d:(i + 1) * d, i * d:(i + 1) * d] = np.asarray(D[i])
        for i in range(N - 1):
            Hd[(i + 1) * d:(i + 2) * d, i * d:(i + 1) * d] = np.asarray(B[i])
            Hd[i * d:(i + 1) * d, (i + 1) * d:(i + 2) * d] = np.asarray(B[i]).T
        ref = np.linalg.inv(Hd)

        L, M, ok = block_tridiag_factor(D, B)
        assert bool(ok)
        Sig = block_tridiag_selected_inverse(L, M)
        for i in range(N):
            np.testing.assert_allclose(
                np.asarray(Sig)[i],
                ref[i * d:(i + 1) * d, i * d:(i + 1) * d],
                rtol=1e-9, atol=1e-12)

    def test_single_block(self):
        from tinyopt_tpu.ops.tridiag import (block_tridiag_factor,
                                             block_tridiag_selected_inverse)
        D = jnp.asarray([[[4.0, 1.0], [1.0, 3.0]]])
        B = jnp.zeros((0, 2, 2))
        L, M, ok = block_tridiag_factor(D, B)
        Sig = block_tridiag_selected_inverse(L, M)
        np.testing.assert_allclose(np.asarray(Sig)[0],
                                   np.linalg.inv(np.asarray(D[0])),
                                   rtol=1e-12)


def _chain_instance(N=12, n_loops=3, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.cumsum(rng.normal(size=(N, 3)), axis=0)
    chain = np.stack([np.arange(N - 1), np.arange(1, N)], 1)
    loops = []
    meas = [gt[1:] - gt[:-1] + 1e-3 * rng.normal(size=(N - 1, 3))]
    for _ in range(n_loops):
        i = int(rng.integers(0, N - 2))
        j = int(rng.integers(i + 2, N))
        loops.append([i, j])
        meas.append((gt[j] - gt[i] + 1e-3 * rng.normal(size=3))[None])
    edges = np.concatenate([chain, np.asarray(loops)]) \
        if loops else chain
    edata = jnp.asarray(np.concatenate(meas))
    x = jnp.asarray(gt + 1e-2 * rng.normal(size=(N, 3)))
    return x, edges, edata, jnp.asarray(gt[:1])


def _edge_fn(a, b, d):
    return (b - a) - d


def _unary_fn(a, d):
    return 2.0 * (a - d)      # anchor prior, non-unit weight


class TestChainMarginals:
    def test_marginals_match_dense_inverse(self):
        """ChainSystem.marginals (Takahashi + Woodbury downdate) ==
        diag blocks of inv_cov(dense H), with loop closures."""
        from tinyopt_tpu.chain import chain_system
        x, edges, edata, anchor = _chain_instance()
        spec = mf.tangent_spec(x)
        acc, *_ = chain_system(x, _edge_fn, edges, edata, _unary_fn,
                               [0], anchor, spec)
        H, g, cost = jax.jit(acc)(x)
        assert H.U.shape[-1] == 9       # 3 loop closures x 3 dims
        dense = inv_cov(H.to_dense())
        marg = jax.jit(lambda h: h.marginals())(H)
        N, d = x.shape
        for i in range(N):
            np.testing.assert_allclose(
                np.asarray(marg)[i],
                np.asarray(dense)[i * d:(i + 1) * d, i * d:(i + 1) * d],
                rtol=1e-8, atol=1e-11)

    def test_no_loops(self):
        from tinyopt_tpu.chain import chain_system
        x, edges, edata, anchor = _chain_instance(N=8, n_loops=0)
        spec = mf.tangent_spec(x)
        acc, *_ = chain_system(x, _edge_fn, edges, edata, _unary_fn,
                               [0], anchor, spec)
        H, *_ = jax.jit(acc)(x)
        assert H.U.shape[-1] == 0
        dense = inv_cov(H.to_dense())
        marg = H.marginals()
        d = x.shape[1]
        for i in range(x.shape[0]):
            np.testing.assert_allclose(
                np.asarray(marg)[i],
                np.asarray(dense)[i * d:(i + 1) * d, i * d:(i + 1) * d],
                rtol=1e-8, atol=1e-11)

    def test_entry_point_and_rescale(self):
        """chain_marginals at the SOLUTION of chain_optimize, plus the
        output.h:80-93 rescale."""
        from tinyopt_tpu.chain import (chain_marginals, chain_optimize,
                                       chain_system)
        x0, edges, edata, anchor = _chain_instance()
        xs, out = chain_optimize(x0, _edge_fn, edges, edata,
                                 to.Options(), unary_fn=_unary_fn,
                                 unary_nodes=[0], unary_data=anchor)
        assert bool(out.converged())
        marg = chain_marginals(xs, _edge_fn, edges, edata,
                               unary_fn=_unary_fn, unary_nodes=[0],
                               unary_data=anchor)
        spec = mf.tangent_spec(xs)
        acc, _, n_res, _ = chain_system(xs, _edge_fn, edges, edata,
                                        _unary_fn, [0], anchor, spec)
        H, _, cost = jax.jit(acc)(xs)
        dense = inv_cov(H.to_dense())
        d = xs.shape[1]
        for i in range(xs.shape[0]):
            np.testing.assert_allclose(
                np.asarray(marg)[i],
                np.asarray(dense)[i * d:(i + 1) * d, i * d:(i + 1) * d],
                rtol=1e-7, atol=1e-10)

        marg_r = chain_marginals(xs, _edge_fn, edges, edata,
                                 unary_fn=_unary_fn, unary_nodes=[0],
                                 unary_data=anchor, rescaled=True)
        f = float(cov_rescale(cost.cost, cost.num_residuals, spec.dims))
        np.testing.assert_allclose(np.asarray(marg_r),
                                   np.asarray(marg) * f,
                                   rtol=1e-10, atol=1e-13)

    def test_output_covariance_via_inv(self):
        """Output.covariance() on a chain solve (save_last) == dense
        inv_cov — the small-N compat path through ChainSystem.inv()."""
        from tinyopt_tpu.chain import chain_optimize
        x0, edges, edata, anchor = _chain_instance(N=8)
        o = to.Options(hessian=to.HessianOptions(save_last=True))
        xs, out = chain_optimize(x0, _edge_fn, edges, edata, o,
                                 unary_fn=_unary_fn, unary_nodes=[0],
                                 unary_data=anchor)
        cov = out.covariance()
        assert cov is not None
        ref = inv_cov(out.final_hessian.to_dense())
        np.testing.assert_allclose(np.asarray(cov), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)

    def test_singular_gauge_is_nan(self):
        """No anchor -> H singular -> marginals are NaN (inv_cov
        contract), not silently wrong."""
        from tinyopt_tpu.chain import chain_marginals
        x, edges, edata, _ = _chain_instance(N=6, n_loops=0)
        marg = chain_marginals(x, _edge_fn, edges, edata)
        assert not bool(np.all(np.isfinite(np.asarray(marg))))


class TestBucketedMarginals:
    def test_matches_single_slab_covariance(self):
        """schur_sparse_covariance_buckets == the single-slab marginals
        on the same instance (same algebra, bucket summation order)."""
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        x, obs, cam_idx, smask = _obs_instance(n_a=4, n_b=32)
        cov_a0, cov_b0 = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8)
        slabs = bucket_obs(obs, cam_idx, smask, min_bucket=4)
        assert len(slabs) >= 2
        cov_a, cov_b = to.schur_sparse_covariance_buckets(
            x, pair_fn, slabs, chunk=8)
        np.testing.assert_allclose(np.asarray(cov_a), np.asarray(cov_a0),
                                   rtol=1e-8, atol=1e-11)
        np.testing.assert_allclose(np.asarray(cov_b), np.asarray(cov_b0),
                                   rtol=1e-8, atol=1e-11)

        cov_ar, cov_br = to.schur_sparse_covariance_buckets(
            x, pair_fn, slabs, chunk=8, rescaled=True)
        cov_ar0, _ = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask, chunk=8, rescaled=True)
        np.testing.assert_allclose(np.asarray(cov_ar),
                                   np.asarray(cov_ar0),
                                   rtol=1e-8, atol=1e-11)


class TestSchurCg:
    """hessian.schur_cg_iters: block-Jacobi PCG reduced solve (inexact
    LM) across the Schur paths — must reach the same solution quality
    as the direct Cholesky."""

    def test_sparse_obs_converges_to_direct_quality(self):
        x, obs, cam_idx, smask = _obs_instance()
        o_direct = to.Options(max_iters=10, max_consec_failures=0,
                              hessian=to.HessianOptions(save_last=False))
        o_cg = to.Options(max_iters=14, max_consec_failures=0,
                          hessian=to.HessianOptions(
                              save_last=False, schur_cg_iters=40))
        xd, outd = to.schur_sparse_optimize(x, pair_fn, obs, cam_idx,
                                            smask, o_direct)
        xc, outc = to.schur_sparse_optimize(x, pair_fn, obs, cam_idx,
                                            smask, o_cg)
        assert bool(outc.succeeded())
        assert float(outc.final_cost.cost) <= \
            1.01 * float(outd.final_cost.cost) + 1e-12

    def test_grid_converges_to_direct_quality(self):
        from tinyopt_tpu.models.bundle_adjustment import (make_ba_problem,
                                                          project)
        data, x0, _ = make_ba_problem(n_cams=4, n_pts=24, noise=1e-4,
                                      seed=5, visibility=0.6)

        def pf(pose, point, ob):
            return project(pose, point[None, :])[0] - ob

        xt = (x0["poses"], x0["points"])
        o_direct = to.Options(max_iters=10, max_consec_failures=0,
                              hessian=to.HessianOptions(save_last=False))
        o_cg = to.Options(max_iters=14, max_consec_failures=0,
                          hessian=to.HessianOptions(
                              save_last=False, schur_cg_iters=40))
        xd, outd = to.schur_optimize(xt, pf, data.observations,
                                     data.mask, o_direct)
        xc, outc = to.schur_optimize(xt, pf, data.observations,
                                     data.mask, o_cg)
        assert bool(outc.succeeded())
        assert float(outc.final_cost.cost) <= \
            1.01 * float(outd.final_cost.cost) + 1e-12


class TestDegenerateLayouts:
    def test_k1_layout_solves(self):
        """K=1 (every landmark observed once + priors via extra slots is
        impossible -> needs camera coverage): the planned reduce has NO
        strict-lower pairs; r4 regression pin (empty-plan crash)."""
        rng = np.random.default_rng(0)
        n_a, n_b = 4, 24
        a = {"u": jnp.asarray(rng.normal(size=(n_a, 2))),
             "v": jnp.asarray(rng.normal(size=(n_a, 1)))}
        b = jnp.asarray(rng.normal(size=(n_b, 2)))
        obs = {"A": jnp.asarray(rng.normal(size=(n_b, 1, M, 3))),
               "B": jnp.asarray(rng.normal(size=(n_b, 1, M, 2))),
               "y": jnp.asarray(rng.normal(size=(n_b, 1, M)))}
        cam_idx = jnp.asarray(rng.integers(0, n_a, size=(n_b, 1)),
                              jnp.int32)
        mask = jnp.ones((n_b, 1))
        x, out = to.schur_sparse_optimize(
            (a, b), pair_fn, obs, cam_idx, mask,
            to.Options(max_iters=8, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False)))
        assert bool(out.succeeded())
        cov_a, cov_b = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, mask)
        assert np.all(np.isfinite(np.asarray(cov_a)))

    def test_cap1_bucket_solves(self):
        """A bucket whose cap is 1 must run through the bucketed system
        (r4 regression pin: empty planned-reduce plan)."""
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        x, obs, cam_idx, smask = _obs_instance(n_a=4, n_b=32)
        m = np.array(smask)
        m[:20, 1:] = 0.0                 # 20 single-observation points
        smask = jnp.asarray(m)
        slabs = bucket_obs(obs, cam_idx, smask, min_bucket=4)
        assert any(np.asarray(s[1]).shape[1] == 1 for s in slabs)
        xs, out = to.schur_sparse_optimize_buckets(
            x, pair_fn, slabs,
            to.Options(max_iters=8, max_consec_failures=0,
                       hessian=to.HessianOptions(save_last=False)))
        assert bool(out.succeeded())

    def test_dead_landmark_covariance_is_nan(self):
        """A landmark with zero observations has a singular H row; its
        marginal must be NaN (inv_cov contract), not the identity block
        the zero-C substitution would leak (r4 review finding)."""
        x, obs, cam_idx, smask = _obs_instance()
        m = np.array(smask)
        m[7, :] = 0.0
        smask = jnp.asarray(m)
        cov_a, cov_b = to.schur_sparse_covariance(
            x, pair_fn, obs, cam_idx, smask)
        assert np.all(np.isnan(np.asarray(cov_b)[7]))
        live = np.asarray(cov_b)[np.arange(N_B) != 7]
        assert np.all(np.isfinite(live))

        from tinyopt_tpu.parallel import sharded_schur_sparse_covariance
        x2, obs2, ci2, mk2 = _obs_instance(n_a=4, n_b=32)
        m2 = np.array(mk2)
        m2[5, :] = 0.0
        ca, cb = sharded_schur_sparse_covariance(
            x2, pair_fn, obs2, ci2, jnp.asarray(m2))
        assert np.all(np.isnan(np.asarray(cb)[5]))

    def test_bucketed_and_sharded_cg(self):
        """schur_cg_iters plumbs through the bucketed and sharded
        entries (solution quality matches the direct solve)."""
        from tinyopt_tpu.ops.schur_obs import bucket_obs
        from tinyopt_tpu.parallel import sharded_schur_sparse_optimize
        x, obs, cam_idx, smask = _obs_instance(n_a=4, n_b=32)
        o_direct = to.Options(max_iters=10, max_consec_failures=0,
                              hessian=to.HessianOptions(save_last=False))
        o_cg = to.Options(max_iters=14, max_consec_failures=0,
                          hessian=to.HessianOptions(
                              save_last=False, schur_cg_iters=40))
        xd, outd = to.schur_sparse_optimize(x, pair_fn, obs, cam_idx,
                                            smask, o_direct)
        ref = float(outd.final_cost.cost)

        slabs = bucket_obs(obs, cam_idx, smask, min_bucket=4)
        xb, outb = to.schur_sparse_optimize_buckets(
            x, pair_fn, slabs, o_cg)
        assert float(outb.final_cost.cost) <= 1.01 * ref + 1e-12

        xs, outs = sharded_schur_sparse_optimize(
            x, pair_fn, obs, cam_idx, smask, o_cg)
        assert float(outs.final_cost.cost) <= 1.01 * ref + 1e-12


class TestBandedMarginals:
    """obs_marginals_banded (r5): selected-inverse covariance through
    BAND storage — neither the (n_a, n_a) S grid nor the dense S⁻¹
    exists.  Exact algebra: must match the dense marginal path."""

    def _corridor(self, n_a=24, n_b=96, K=4, seed=5):
        rng = np.random.default_rng(seed)
        a = jnp.asarray(rng.normal(size=(n_a, 3)))
        b = jnp.asarray(rng.normal(size=(n_b, 2)))
        base = np.clip((np.arange(n_b) * n_a) // n_b, 0, n_a - K)
        ci = jnp.asarray(base[:, None] + np.arange(K)[None, :],
                         jnp.int32)
        obs = {"A": jnp.asarray(rng.normal(size=(n_b, K, 4, 3))),
               "B": jnp.asarray(rng.normal(size=(n_b, K, 4, 2))),
               "y": jnp.asarray(rng.normal(size=(n_b, K, 4)))}
        mk = np.asarray(rng.random((n_b, K)) < 0.85, np.float64)
        mk[:, 0] = 1.0
        return a, b, obs, ci, jnp.asarray(mk)

    @staticmethod
    def _pf(cam, pt, d):
        return d["A"] @ cam + d["B"] @ pt - d["y"]

    def test_matches_dense_marginals(self, monkeypatch):
        monkeypatch.setenv("TINYOPT_WINDOW_REDUCE", "1")
        from tinyopt_tpu.ops.schur_obs import banded_cov_plan
        a, b, obs, ci, mk = self._corridor()
        assert banded_cov_plan(ci, mk, 24, 3) is not None
        cov_a_b, cov_b_b = to.schur_sparse_covariance(
            (a, b), self._pf, obs, ci, mk, chunk=16)
        monkeypatch.setenv("TINYOPT_WINDOW_REDUCE", "0")

        def pf_dense(cam, pt, d):      # fresh fn: fresh cache entry
            return d["A"] @ cam + d["B"] @ pt - d["y"]

        cov_a_d, cov_b_d = to.schur_sparse_covariance(
            (a, b), pf_dense, obs, ci, mk, chunk=16)
        np.testing.assert_allclose(np.asarray(cov_a_b),
                                   np.asarray(cov_a_d),
                                   rtol=1e-8, atol=1e-11)
        np.testing.assert_allclose(np.asarray(cov_b_b),
                                   np.asarray(cov_b_d),
                                   rtol=1e-8, atol=1e-11)

    def test_scrambled_layout_matches(self, monkeypatch):
        """Scrambled landmark order: bandwidth is landmark-order
        invariant, so the banded route still applies (with wider
        windows) and its orientation weights must hold under arbitrary
        row order; cov_b comes back in the caller's order.  (At scales
        where the scrambled windows exceed the budget, the entry sorts
        internally first — same algebra.)"""
        monkeypatch.setenv("TINYOPT_WINDOW_REDUCE", "1")
        from tinyopt_tpu.ops.schur_obs import banded_cov_plan
        a, b, obs, ci, mk = self._corridor()
        rng = np.random.default_rng(9)
        perm = rng.permutation(96)
        b2 = b[perm]
        obs2 = jax.tree_util.tree_map(lambda l: l[perm], obs)
        ci2, mk2 = ci[perm], mk[perm]

        def pf_s(cam, pt, d):
            return d["A"] @ cam + d["B"] @ pt - d["y"]

        cov_a_s, cov_b_s = to.schur_sparse_covariance(
            (a, b2), pf_s, obs2, ci2, mk2, chunk=16)

        def pf_n(cam, pt, d):
            return d["A"] @ cam + d["B"] @ pt - d["y"]

        cov_a_n, cov_b_n = to.schur_sparse_covariance(
            (a, b), pf_n, obs, ci, mk, chunk=16)
        np.testing.assert_allclose(np.asarray(cov_a_s),
                                   np.asarray(cov_a_n),
                                   rtol=1e-8, atol=1e-11)
        np.testing.assert_allclose(np.asarray(cov_b_s),
                                   np.asarray(cov_b_n)[perm],
                                   rtol=1e-8, atol=1e-11)
