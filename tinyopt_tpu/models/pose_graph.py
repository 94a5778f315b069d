"""Pose-graph optimization (SLAM backend).

The second canonical large-NLLS family of the reference's domain (with
bundle adjustment): N poses on SE(3) linked by noisy relative-pose
measurements; residual of edge (i, j) with measurement Ẑᵢⱼ:

    r_ij = log(Ẑᵢⱼ⁻¹ · Xᵢ⁻¹ · Xⱼ)      ∈ ℝ⁶

TPU-native formulation: the edge list is a DENSE static (E, 2) index
array; per-edge residuals are gathered + vmapped (static shapes, batched
Lie ops), and the pose block is one batched-SE3 leaf.  Gauge freedom is
fixed by a prior residual on pose 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..manifolds import SE3, SO3


class PoseGraphData(NamedTuple):
    edges: jax.Array       #: (E, 2) int32 — (i, j) vertex indices
    meas_q: jax.Array      #: (E, 4) measured relative rotation (wxyz)
    meas_t: jax.Array      #: (E, 3) measured relative translation
    anchor_q: jax.Array    #: (4,) prior pose-0 rotation
    anchor_t: jax.Array    #: (3,) prior pose-0 translation


def _rel(poses: SE3, i, j) -> SE3:
    """Xᵢ⁻¹ · Xⱼ for gathered vertex indices."""
    qi = poses.rotation.wxyz[i]
    ti = poses.translation[i]
    qj = poses.rotation.wxyz[j]
    tj = poses.translation[j]
    Xi = SE3(SO3(qi), ti)
    Xj = SE3(SO3(qj), tj)
    return Xi.inverse() @ Xj


def pose_graph_residuals(poses: SE3, data: PoseGraphData) -> jax.Array:
    """Stacked edge residuals + the gauge-anchoring prior on pose 0."""
    def edge_res(e, q, t):
        rel = _rel(poses, e[0], e[1])
        meas_inv = SE3(SO3(q), t).inverse()
        return (meas_inv @ rel).log()

    r_edges = jax.vmap(edge_res)(data.edges, data.meas_q, data.meas_t)

    anchor = SE3(SO3(data.anchor_q), data.anchor_t)
    x0 = SE3(SO3(poses.rotation.wxyz[0]), poses.translation[0])
    r_anchor = (anchor.inverse() @ x0).log()
    return jnp.concatenate([r_edges.reshape(-1), r_anchor])


def make_pose_graph(n_poses: int = 12, extra_loops: int = 4,
                    noise: float = 0.0, init_noise: float = 0.1,
                    dtype=jnp.float64, seed: int = 0):
    """Synthetic pose graph: a chain (odometry) plus random loop closures.

    Returns ``(data, x0 poses, true poses)``.
    """
    rng = np.random.default_rng(seed)
    # Ground-truth trajectory: random smooth chain
    deltas = 0.4 * rng.uniform(-1, 1, (n_poses - 1, 6))
    true = [SE3.identity(dtype)]
    for k in range(n_poses - 1):
        true.append(true[-1] @ SE3.exp(jnp.asarray(deltas[k], dtype)))
    true_poses = SE3(
        SO3(jnp.stack([p.rotation.wxyz for p in true])),
        jnp.stack([p.translation for p in true]))

    edges = [(k, k + 1) for k in range(n_poses - 1)]
    for _ in range(extra_loops):
        i, j = sorted(rng.choice(n_poses, size=2, replace=False))
        if j - i > 1:
            edges.append((int(i), int(j)))
    edges = np.asarray(edges, np.int32)

    meas_q, meas_t = [], []
    for (i, j) in edges:
        rel = true[i].inverse() @ true[j]
        dq = noise * rng.normal(size=6)
        noisy = rel @ SE3.exp(jnp.asarray(dq, dtype))
        meas_q.append(noisy.rotation.wxyz)
        meas_t.append(noisy.translation)

    data = PoseGraphData(
        edges=jnp.asarray(edges),
        meas_q=jnp.stack(meas_q), meas_t=jnp.stack(meas_t),
        anchor_q=true[0].rotation.wxyz, anchor_t=true[0].translation)

    # Perturbed initial guess (anchor kept exact)
    dw = init_noise * rng.normal(size=(n_poses, 6))
    dw[0] = 0.0
    x0 = jax.vmap(lambda q, t, w: SE3(SO3(q), t) @ SE3.exp(
        jnp.asarray(w, dtype)))(true_poses.rotation.wxyz,
                                true_poses.translation, jnp.asarray(dw))
    return data, x0, true_poses
