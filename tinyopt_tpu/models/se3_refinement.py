"""Batched SE(3) pose refinement — the flagship model.

BASELINE.json config: "Batched SE(3) pose refinement (Sophus/Lie params):
10k instances sharded over a multi-host mesh".  Each instance refines one
SE(3) pose from K noisy 3D point correspondences:

    r_k = T · p_k − q_k           (K×3 residuals, 6-dim tangent)

The pose is an ``SE3`` manifold parameter; the LM loop linearizes on the
tangent space with the right-multiplicative retraction.  This is the
domain's equivalent of a "model family": the same structure underlies
ICP, PnP refinement and pose-graph node updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..manifolds import SE3, SO3


class SE3RefinementData(NamedTuple):
    points: jax.Array   #: (..., K, 3) source points
    targets: jax.Array  #: (..., K, 3) observed transformed points


def se3_residual(pose: SE3, data: SE3RefinementData):
    """Per-instance residuals: T·p − q, flattened to (K·3,)."""
    pred = pose.rotation.apply(data.points) + pose.translation[..., None, :]
    return (pred - data.targets).reshape(-1)


def make_se3_refinement(batch: int, n_points: int = 16, noise: float = 1e-3,
                        dtype=jnp.float32, seed: int = 0):
    """Generate batched instances: (data, x0 poses, true poses)."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    points = jax.random.uniform(ks[0], (batch, n_points, 3), dtype, -1, 1)
    w_true = jax.random.uniform(ks[1], (batch, 6), dtype, -0.5, 0.5)
    true_pose = SE3.exp(w_true)
    # Broadcast each instance's rotation over its K points
    rot_b = SO3(true_pose.rotation.wxyz[:, None, :])
    targets = rot_b.apply(points) + true_pose.translation[:, None, :]
    targets = targets + noise * jax.random.normal(
        ks[2], targets.shape, dtype)
    # Perturbed initial poses
    w0 = w_true + 0.1 * jax.random.normal(ks[3], (batch, 6), dtype)
    x0 = SE3.exp(w0)
    return SE3RefinementData(points, targets), x0, true_pose
