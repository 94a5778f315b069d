"""Bundle adjustment — run: python examples/bundle_adjustment.py

Joint refinement of camera poses (batched SE(3), on the manifold) and 3-D
landmarks from noisy 2-D observations: the classic structure-from-motion
backend problem. Parameters are a pytree {poses: SE3 batch, points: array}
whose tangent space concatenates 6 DoF per pose and 3 per landmark — the
optimizer sees one flat tangent vector, retractions are applied per leaf
(reference analogue: the Sophus/Lie++ trait integrations,
include/tinyopt/3rdparty/traits/sophus.h:14-43; the joint-block pytree has
no reference counterpart).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import tinyopt_tpu as to
from tinyopt_tpu.models.bundle_adjustment import (
    ba_residuals, make_ba_problem, reprojection_rmse)


def main():
    data, x0, x_true = make_ba_problem(
        n_cams=4, n_pts=24, noise=1e-3, seed=0, dtype=jnp.float64)
    print(f"initial reprojection RMSE: "
          f"{float(reprojection_rmse(x0, data)):.2e}")

    opts = to.Options(max_iters=50, max_consec_failures=0)
    x_opt, out = to.optimize(x0, lambda p: ba_residuals(p, data), opts)

    print(out)
    print(f"final reprojection RMSE:   "
          f"{float(reprojection_rmse(x_opt, data)):.2e} "
          f"(observation noise 1e-3)")
    print(f"stop: {out.stop_reason_description()}")


def robust_gnc():
    """Outlier-contaminated BA via Schur + graduated non-convexity.

    15% of the observations get gross (~0.5-magnitude) offsets — wrong
    correspondences.  A Geman-McClure-whitened pair_fn with an ANNEALED
    scale (GNC: start near-quadratic, tighten toward the noise level)
    recovers the outlier-free geometry exactly; single-stage Huber lands
    at its linear tail's estimator bias instead (the oracle point has
    HIGHER Huber cost — measured in tests/test_schur.py TestRobustSchur).
    """
    import numpy as np
    from tinyopt_tpu.losses.robust_norms import (geman_mcclure, gnc_anneal,
                                                 gnc_schedule)
    from tinyopt_tpu.models.bundle_adjustment import BAData, project

    noise = 1e-3
    data, x0, _ = make_ba_problem(n_cams=6, n_pts=64, noise=noise, seed=13)
    rng = np.random.default_rng(99)
    bad = rng.uniform(size=data.mask.shape) < 0.15
    gross = rng.uniform(0.3, 0.7, data.observations.shape) * \
        rng.choice([-1.0, 1.0], data.observations.shape)
    obs = jnp.where(jnp.asarray(bad)[:, :, None] * data.mask[:, :, None] > 0,
                    data.observations + jnp.asarray(gross),
                    data.observations)
    clean = BAData(data.observations,
                   data.mask * (1.0 - jnp.asarray(bad.astype(float))))

    def pair_fn(pose, point, ob):
        return project(pose, point[None, :])[0] - ob

    def rmse_on_inliers(x):
        return float(reprojection_rmse({"poses": x[0], "points": x[1]},
                                       clean))

    opts = to.Options(max_iters=60, max_consec_failures=0, min_error=0.0)

    def stage(x, th2, rp):
        x, out = to.schur_optimize(x, rp, obs, data.mask, opts)
        print(f"  GNC stage th={th2 ** 0.5:<7.4f}: clean-inlier RMSE "
              f"{rmse_on_inliers(x):.2e}")
        return x, out

    # gnc_anneal builds (and memoizes) the whitened pair_fn per
    # threshold itself — the naive call is the cached fast path.
    x, out = gnc_anneal(stage, (x0["poses"], x0["points"]),
                        gnc_schedule(0.5, 5 * noise, steps=5),
                        residual_fn=pair_fn, robust_fn=geman_mcclure)
    print(f"final: {rmse_on_inliers(x):.2e} (noise level {noise:.0e}, "
          "despite 15% gross outliers)")


if __name__ == "__main__":
    main()
    print("\nrobust GNC bundle adjustment (15% gross outliers):")
    robust_gnc()
