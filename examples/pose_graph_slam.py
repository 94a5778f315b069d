"""Pose-graph optimization (SLAM backend) — run: python examples/pose_graph_slam.py

A robot drives a loop; odometry drifts; loop closures pull the trajectory
back together. Poses are a batched SE(3) manifold leaf (one retraction
per pose), measurements are relative SE(3) transforms along the chain plus
random loop closures, and the first pose anchors the gauge. The whole
graph is solved with LM; the matrix-free GN-CG backend handles larger
graphs without ever materializing the (6n × 6n) Hessian.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import tinyopt_tpu as to
from tinyopt_tpu import manifold as mf
from tinyopt_tpu.models.pose_graph import make_pose_graph, pose_graph_residuals


def pose_errors(poses, true_poses):
    def one(q, t, tq, tt):
        from tinyopt_tpu.manifolds import SE3, SO3
        T = SE3(SO3(q), t)
        Tt = SE3(SO3(tq), tt)
        return jnp.linalg.norm((T.inverse() @ Tt).log())
    return jax.vmap(one)(poses.rotation.wxyz, poses.translation,
                         true_poses.rotation.wxyz, true_poses.translation)


def main():
    data, x0, true_poses = make_pose_graph(n_poses=20, extra_loops=6,
                                           noise=5e-3, seed=1)
    print(f"graph: 20 poses, {data.edges.shape[0]} edges, "
          f"tangent dims = {mf.tangent_spec(x0).dims}")
    print(f"initial max pose error: "
          f"{float(jnp.max(pose_errors(x0, true_poses))):.3f}")

    x, out = to.optimize(x0, lambda p: pose_graph_residuals(p, data),
                         to.Options(max_iters=100, max_consec_failures=0))

    print(out)
    print(f"final max pose error:   "
          f"{float(jnp.max(pose_errors(x, true_poses))):.4f} "
          "(~ measurement noise)")
    print(f"stop: {out.stop_reason_description()}")

    # posterior pose uncertainty WITHOUT densifying H: Takahashi
    # selected inverse off the chain solver's block-tridiagonal factor
    # (+ Woodbury loop-closure downdate) — O(N·d³), scales to
    # thousands of poses (chain.py / ops/tridiag.py)
    from tinyopt_tpu.models.pose_graph import pose_graph_marginals
    marg = pose_graph_marginals(x, data, rescaled=True)
    sig = jnp.sqrt(jnp.diagonal(marg, axis1=1, axis2=2))
    print(f"pose-position sigma: anchored {float(sig[0, 3]):.2e} -> "
          f"chain end {float(sig[-1, 3]):.2e} (uncertainty grows away "
          f"from the anchor; loop closures pull it back down)")


if __name__ == "__main__":
    main()
