"""BAL bundle adjustment — run: python examples/bal_problems.py

The "Bundle Adjustment in the Large" workflow end-to-end: a 9-parameter
camera instance (angle-axis rotation, translation, focal + two radial
distortion coefficients; BAL's −z viewing convention) is written to the
published text format, loaded back, solved with the point-major Schur
solver, and finally re-solved under 15% gross outliers with graduated
non-convexity — the production SfM pipeline in miniature.  Drop in a
downloaded problem-*.txt.bz2 from grail.cs.washington.edu/projects/bal
via --bal-file to run on the real datasets.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import tinyopt_tpu as to
from tinyopt_tpu.losses import geman_mcclure, gnc_anneal, gnc_schedule
from tinyopt_tpu.models.bal import (bal_residual, bal_rmse, load_bal,
                                    make_bal_problem, write_bal)


def solve(x0, obs, cam_idx, mask, opts):
    (cams, pts), out = to.schur_sparse_optimize(
        x0, bal_residual, obs, cam_idx, mask, opts)
    rmse = float(bal_rmse(cams, pts, obs, cam_idx, mask))
    print(f"  -> rmse {rmse:8.3f} px  iters {int(out.num_iters)}  "
          f"{out.stop_reason_description()}")
    return (cams, pts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bal-file", default=None,
                    help="a BAL problem-*.txt[.bz2] to load instead of "
                         "the synthetic instance")
    args = ap.parse_args()

    opts = to.Options(max_iters=25, max_consec_failures=0,
                      hessian=to.HessianOptions(save_last=False))

    if args.bal_file:
        print(f"loading {args.bal_file} ...")
        # published BAL visibility is heavy-tailed: the bucketed layout
        # bounds padded slots ~2x the observation count instead of
        # n_pts * K_max (models/bal.py)
        slabs, x0 = load_bal(args.bal_file, layout="bucketed")
        n_cams = int(np.asarray(x0[0]["intr"]).shape[0])
        n_pts = int(np.asarray(x0[1]).shape[0])
        n_obs = sum(int(np.asarray(s[2]).sum()) for s in slabs)
        print(f"{n_cams} cameras, {n_pts} points, {n_obs} observations; "
              f"K-buckets: "
              f"{[(len(np.asarray(s[3])), np.asarray(s[1]).shape[1]) for s in slabs]}")
        print("solving (schur_sparse_optimize_buckets):")
        (cams, pts), out = to.schur_sparse_optimize_buckets(
            x0, bal_residual, slabs, opts)
        # pixel RMSE over all buckets
        num = den = 0.0
        for obs_g, ci_g, mk_g, ids in slabs:
            e = bal_rmse(cams, pts[np.asarray(ids)], obs_g, ci_g, mk_g)
            n = float(np.asarray(mk_g).sum())
            num += float(e) ** 2 * n
            den += n
        print(f"  -> rmse {(num / max(den, 1.0)) ** 0.5:8.3f} px  "
              f"iters {int(out.num_iters)}  "
              f"{out.stop_reason_description()}")
        return

    # --- synthetic corridor instance, BAL conventions -----------------
    (obs, cam_idx, mask), x0, x_true, _ = make_bal_problem(
        n_cams=16, n_pts=160, k_obs=4, noise=0.5, seed=2)
    print("synthetic BAL instance: 16 cameras x 160 landmarks, "
          "0.5 px noise")
    print(f"rmse at start: "
          f"{float(bal_rmse(x0[0], x0[1], obs, cam_idx, mask)):.3f} px")

    # round-trip through the published file format
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "problem-16-160.txt")
        write_bal(path, x0[0], x0[1], obs, cam_idx, mask)
        (obs, cam_idx, mask), x0 = load_bal(path)
    print("write_bal -> load_bal round trip ok; solving:")
    solve(x0, obs, cam_idx, mask, opts)
    # (posterior marginals need a FIXED gauge — a free BA's undamped H
    # is singular; see examples/pose_graph_slam.py for the anchored
    # marginal-covariance demo, and to.schur_sparse_covariance for the
    # BA-scale API)

    # --- 15% gross outliers: plain L2 vs graduated non-convexity ------
    (obs_o, ci_o, mk_o), x0_o, _, bad = make_bal_problem(
        n_cams=16, n_pts=160, k_obs=4, noise=0.5, outlier_frac=0.15,
        seed=2)
    print("\nsame instance with 15% gross outliers:")
    print("plain L2 (wrecked):")
    solve(x0_o, obs_o, ci_o, mk_o, opts)

    print("Geman-McClure GNC (threshold ladder 50 -> 2 px):")

    # gnc_anneal owns the per-threshold whitened-fn construction (and
    # memoizes it across calls, so repeated anneals recompile nothing):
    # pass the RAW residual + M-estimator and take the whitened fn as
    # the stage's third argument.
    sched = gnc_schedule(50.0, 2.0, steps=5)

    def stage(x, th2, rp):
        return to.schur_sparse_optimize(x, rp, obs_o, ci_o,
                                        mk_o, opts)

    x_gnc, out = gnc_anneal(stage, x0_o, sched,
                            residual_fn=bal_residual,
                            robust_fn=geman_mcclure)
    # judge against the CLEAN observations on uncorrupted slots of
    # determined landmarks (<2 clean rays = legitimately unrecoverable)
    bad = np.asarray(bad)
    det = (bad.shape[1] - bad.sum(1)) >= 2
    good = jnp.asarray((~bad) & det[:, None], obs.dtype)
    e = float(bal_rmse(x_gnc[0], x_gnc[1], obs, cam_idx,
                       jnp.asarray(mk_o) * good))
    print(f"  -> inlier-slot rmse vs CLEAN data: {e:.3f} px "
          f"(noise 0.5 px — oracle-level recovery)")


if __name__ == "__main__":
    main()
