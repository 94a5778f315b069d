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


if __name__ == "__main__":
    main()
