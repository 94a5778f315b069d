"""Generate tests/data/bal_excerpt.txt — a real-FORMAT, real-DISTRIBUTION
BAL excerpt fixture (VERDICT r3 task #3).

The environment has zero egress, so the published BAL files cannot be
fetched; this fixture reproduces what makes them hard instead of their
bytes: BAL camera units (f ~ hundreds of px, mild radial distortion,
−z viewing, Rodrigues rotations in the file), pixel-scale observations,
and the HEAVY-TAILED visibility of real SfM (observation counts drawn
from a truncated Zipf — mean ~5 obs/landmark, max ~15× the mean), the
regime where a single (n_pts, K_max) padded slab inflates ~10×.

Deterministic: re-running this script reproduces the committed file.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))


def main(path=None):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tinyopt_tpu.models.bal import (bal_project, cameras_from_bal,
                                        write_bal)

    rng = np.random.default_rng(42)
    n_cams, n_pts = 30, 600
    rail = 0.4 * np.arange(n_cams)

    # landmarks along the rail, in FRONT (−z, the BAL convention)
    px = rng.uniform(rail[0], rail[-1], n_pts)
    py = rng.uniform(-1.0, 1.0, n_pts)
    pz = rng.uniform(-6.0, -3.0, n_pts)
    pts = np.stack([px, py, pz], 1)

    # BAL-unit cameras: Rodrigues ~ small, f ~ 500 px, mild k1/k2
    aa = 0.02 * rng.standard_normal((n_cams, 3))
    t = np.stack([-rail, np.zeros(n_cams), np.zeros(n_cams)], 1)
    f = 480.0 + 60.0 * rng.standard_normal(n_cams)
    k1 = 1e-2 * rng.standard_normal(n_cams)
    k2 = 1e-3 * rng.standard_normal(n_cams)
    params9 = np.concatenate(
        [aa, t, f[:, None], k1[:, None], k2[:, None]], 1)
    cams = cameras_from_bal(params9, jnp.float64)

    # heavy-tailed observation counts: truncated Zipf in [2, 30]
    counts = np.minimum(1 + rng.zipf(1.6, n_pts), 30)
    counts = np.maximum(counts, 2)

    cam_rows, pt_rows, xy_rows = [], [], []
    nearest = np.clip(np.searchsorted(rail, px), 0, n_cams - 1)
    for j in range(n_pts):
        c = counts[j]
        lo = int(np.clip(nearest[j] - c // 2, 0, max(n_cams - c, 0)))
        cs = np.arange(lo, min(lo + c, n_cams))
        for ci in cs:
            cam = jax.tree_util.tree_map(lambda l: l[ci], cams)
            uv = np.asarray(bal_project(cam, jnp.asarray(pts[j])))
            uv = uv + 0.5 * rng.standard_normal(2)     # 0.5 px noise
            cam_rows.append(ci)
            pt_rows.append(j)
            xy_rows.append(uv)

    # emit via the padded layout write_bal understands
    cam_i = np.asarray(cam_rows, np.int64)
    pt_i = np.asarray(pt_rows, np.int64)
    xy = np.asarray(xy_rows)
    from tinyopt_tpu.models.bal import _to_point_major
    obs, cam_idx, mask = _to_point_major(cam_i, pt_i, xy, n_pts, None,
                                         jnp.float64)
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bal_excerpt.txt")
    write_bal(path, cams, jnp.asarray(pts), obs, cam_idx, mask)
    n_obs = len(cam_rows)
    print(f"wrote {path}: {n_cams} cams, {n_pts} pts, {n_obs} obs, "
          f"mean {n_obs / n_pts:.1f} / max {counts.max()} obs/pt")


if __name__ == "__main__":
    main()
