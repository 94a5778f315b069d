"""SO(3) rotation manifold (unit quaternion), JAX pytree + registered manifold.

The TPU-native equivalent of the reference's Sophus/Lie++ trait
integrations (reference: include/tinyopt/3rdparty/traits/sophus.h:14-43):
tangent dimension 3, retraction ``R ⊞ δ = R · exp(δ)`` (right-multiply),
with AD-friendly, Taylor-guarded exp/log maps.

Quaternions are stored wxyz.  All ops are batched-friendly (leading dims
broadcast), jit/vmap-safe, with no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..manifold import Manifold, register_manifold

def _small(theta2):
    """Small-angle guard threshold, dtype-aware (f32-safe: no underflow)."""
    eps = jnp.finfo(theta2.dtype).eps
    return theta2 < eps ** 0.5


def _qmul(a, b):
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def _exp_quat(w):
    """so(3) -> unit quaternion, NaN-safe under AD at θ=0.

    Uses the where-guard idiom: the singular branch never sees θ=0 (its
    operand is replaced by 1), and small angles take a Taylor series whose
    derivative is exact at 0 — both the value AND the jvp are finite, which
    is what the LM linearization at δ=0 differentiates through.
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = _small(theta2)
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    qw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([qw, k * w], axis=-1)


def _log_quat(q):
    """Unit quaternion -> so(3) tangent (angle-axis), NaN-safe under AD."""
    qw = q[..., :1]
    qv = q[..., 1:]
    n2 = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = _small(n2)
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    angle = 2.0 * jnp.arctan2(n, jnp.abs(qw))
    # angle/n ≈ 2/|qw| · (1 − n²/(3qw²)) for small n (the overall sign(qw)
    # factor below handles the quaternion double cover)
    aqw = jnp.maximum(jnp.abs(qw), 1e-3)
    scale = jnp.where(small,
                      2.0 / aqw * (1.0 - n2 / (3.0 * aqw * aqw)),
                      angle / n)
    sign = jnp.where(qw < 0, -1.0, 1.0)
    return sign * scale * qv


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SO3:
    wxyz: jax.Array  #: (..., 4) unit quaternion, scalar-first

    @staticmethod
    def identity(dtype=jnp.float32, batch=()):
        q = jnp.zeros(batch + (4,), dtype).at[..., 0].set(1.0)
        return SO3(q)

    @staticmethod
    def exp(w) -> "SO3":
        return SO3(_exp_quat(jnp.asarray(w)))

    @staticmethod
    def from_matrix(R) -> "SO3":
        """Rotation matrix -> quaternion (Shepperd-style, branchless)."""
        R = jnp.asarray(R)
        m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
        m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
        m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
        tr = m00 + m11 + m22
        qw = 0.5 * jnp.sqrt(jnp.clip(1.0 + tr, 1e-12))
        qx = 0.5 * jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12))
        qy = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12))
        qz = 0.5 * jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12))
        qx = qx * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
        qy = qy * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
        qz = qz * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
        q = jnp.stack([qw, qx, qy, qz], axis=-1)
        return SO3(q / jnp.linalg.norm(q, axis=-1, keepdims=True))

    def log(self):
        return _log_quat(self.wxyz)

    def matrix(self):
        w, x, y, z = jnp.moveaxis(self.wxyz, -1, 0)
        row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                          2 * (x * z + w * y)], axis=-1)
        row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                          2 * (y * z - w * x)], axis=-1)
        row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                          1 - 2 * (x * x + y * y)], axis=-1)
        return jnp.stack([row0, row1, row2], axis=-2)

    def apply(self, p):
        """Rotate points p (..., 3)."""
        qv = self.wxyz[..., 1:]
        qw = self.wxyz[..., :1]
        t = 2.0 * jnp.cross(qv, p)
        return p + qw * t + jnp.cross(qv, t)

    def inverse(self) -> "SO3":
        return SO3(self.wxyz * jnp.asarray([1.0, -1.0, -1.0, -1.0],
                                           self.wxyz.dtype))

    def __matmul__(self, other):
        if isinstance(other, SO3):
            return SO3(_qmul(self.wxyz, other.wxyz))
        return self.apply(other)

    def normalized(self) -> "SO3":
        return SO3(self.wxyz / jnp.linalg.norm(self.wxyz, axis=-1,
                                               keepdims=True))


def _so3_dims(x: SO3) -> int:
    """3 per rotation; leading batch axes multiply (a batched SO3 leaf is
    a valid parameter block, e.g. all camera rotations at once)."""
    import numpy as _np
    return 3 * int(_np.prod(x.wxyz.shape[:-1], dtype=int))


def _so3_retract(x: SO3, delta):
    d = delta.reshape(x.wxyz.shape[:-1] + (3,)).astype(x.wxyz.dtype)
    return SO3(_qmul(x.wxyz, _exp_quat(d)))


def _so3_local(x: SO3, y: SO3):
    return _log_quat(_qmul(x.inverse().wxyz, y.wxyz)).reshape(-1)


register_manifold(SO3, Manifold(
    dims=_so3_dims,
    retract=_so3_retract,
    local=_so3_local,
))
