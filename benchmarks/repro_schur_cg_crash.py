"""Minimal repro/bisect harness for the axon TPU worker crash at
``schur_cg_iters=64`` on the 1000-camera flagship (VERDICT r4 #4).

r4 observed: ``schur_cg_iters=64 + max_iters=16`` on the 1000-cam /
50k-landmark corridor "crashed the axon TPU worker twice ('kernel
fault')" while cg=32 at the same scale and cg=64 at 300 cameras are
fine.  This script walks the (n_cams, cg_iters, max_iters) lattice from
known-good upward, ONE config per subprocess, so a worker kill is
attributed to the exact config that caused it and the sweep continues.

Usage:
    python benchmarks/repro_schur_cg_crash.py            # full bisect
    python benchmarks/repro_schur_cg_crash.py one 1000 64 16   # one cell
Each subprocess prints OK/rmse or dies; the parent records the verdict.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_one(n_cams: int, cg: int, max_iters: int):
    import jax
    import jax.numpy as jnp
    import tinyopt_tpu as to
    from tinyopt_tpu.models.bundle_adjustment import (
        make_ba_problem_sparse, project, reprojection_rmse_sparse)

    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    n_pts = 50 * n_cams
    (obs, ci, mk), x0, _ = make_ba_problem_sparse(
        n_cams=n_cams, n_pts=n_pts, k_obs=8, noise=1e-3, seed=7,
        dtype=dtype)

    def pf(pose, point, ob):
        return project(pose, point[None, :])[0] - ob

    o = to.Options(max_iters=max_iters, max_consec_failures=0,
                   min_error=0.0,
                   hessian=to.HessianOptions(save_last=False,
                                             schur_cg_iters=cg))
    if dtype == jnp.float32:
        o = o.for_dtype(dtype)
    x, out = to.schur_sparse_optimize(
        (x0["poses"], x0["points"]), pf, obs, ci, mk, o)
    rmse = float(reprojection_rmse_sparse(
        {"poses": x[0], "points": x[1]}, obs, ci, mk))
    print(f"OK n_cams={n_cams} cg={cg} max_iters={max_iters} "
          f"rmse={rmse:.3e} stop={int(out.stop_reason)}")


def main():
    grid = [
        (300, 64, 16),      # known good (r4)
        (1000, 32, 16),     # known good (r4)
        (600, 64, 16),
        (1000, 48, 16),
        (1000, 64, 4),      # fewer outer iterations
        (1000, 64, 16),     # the r4 crash config
    ]
    for n_cams, cg, mi in grid:
        cmd = [sys.executable, os.path.abspath(__file__), "one",
               str(n_cams), str(cg), str(mi)]
        print(f"--- n_cams={n_cams} cg={cg} max_iters={mi}", flush=True)
        r = subprocess.run(cmd, timeout=3600)
        print(f"    exit={r.returncode}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
