"""Generic SEₙ(3) group manifold: one rotation + n translational 3-vectors.

Counterpart of the reference's Lie++ ``SEn3<T, n>`` integration for
ARBITRARY n (reference: include/tinyopt/3rdparty/traits/lieplusplus.h:17-53,
``Dims = 3 + 3n``); :class:`~tinyopt_tpu.manifolds.se3.SE3` and
:class:`~tinyopt_tpu.manifolds.se23.SE23` are the n = 1 / n = 2 cases with
named fields.  Use SEn3 for states with more translational parts (e.g.
rotation + velocity + position + accelerometer/gyro biases treated as one
group element, n = 4 in some inertial formulations).

Tangent layout ``[v₁, …, vₙ, ω]`` (translational parts first, rotation
last — matching SE23's ``[ν, ρ, ω]``), tangent dimension 3(n+1),
retraction ``X ⊞ δ = X · exp(δ)`` with the shared SO(3) left-Jacobian
V(ω) applied to every translational part.  All ops broadcast over leading
batch axes and are jit/vmap/AD-safe (Taylor-guarded near θ = 0).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..manifold import Manifold, register_manifold
from .se23 import _V_apply, _V_inv_apply
from .so3 import SO3, _exp_quat, _qmul


def _apply_n(rot: SO3, p):
    """Rotate (..., n, 3) points: expand the quaternion over the n axis."""
    return SO3(rot.wxyz[..., None, :]).apply(p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SEn3:
    rotation: SO3
    vectors: jax.Array  #: (..., n, 3) — the n translational parts

    @staticmethod
    def identity(n: int, dtype=jnp.float32, batch=()):
        return SEn3(SO3.identity(dtype, batch),
                    jnp.zeros(batch + (n, 3), dtype))

    @property
    def n(self) -> int:
        return self.vectors.shape[-2]

    @staticmethod
    def exp(delta) -> "SEn3":
        """Tangent (..., 3(n+1)) = [v₁, …, vₙ, ω] -> SEₙ(3)."""
        delta = jnp.asarray(delta)
        n = delta.shape[-1] // 3 - 1
        omega = delta[..., 3 * n:]
        vs = delta[..., :3 * n].reshape(delta.shape[:-1] + (n, 3))
        # V(ω) is shared across the n parts; broadcast ω over the n axis.
        vecs = _V_apply(omega[..., None, :], vs)
        return SEn3(SO3(_exp_quat(omega)), vecs)

    def log(self) -> jax.Array:
        omega = self.rotation.log()
        vs = _V_inv_apply(omega[..., None, :], self.vectors)
        flat = vs.reshape(vs.shape[:-2] + (3 * self.n,))
        return jnp.concatenate([flat, omega], axis=-1)

    def inverse(self) -> "SEn3":
        rinv = self.rotation.inverse()
        return SEn3(rinv, -_apply_n(rinv, self.vectors))

    def __matmul__(self, other: "SEn3") -> "SEn3":
        return SEn3(
            SO3(_qmul(self.rotation.wxyz, other.rotation.wxyz)),
            _apply_n(self.rotation, other.vectors) + self.vectors,
        )


def _sen3_dims(x: SEn3) -> int:
    import numpy as _np
    n = x.vectors.shape[-2]
    return 3 * (n + 1) * int(_np.prod(x.vectors.shape[:-2], dtype=int))


def _sen3_retract(x: SEn3, delta):
    n = x.vectors.shape[-2]
    d = SEn3.exp(delta.reshape(x.vectors.shape[:-2] + (3 * (n + 1),))
                 .astype(x.vectors.dtype))
    return x @ d


def _sen3_local(x: SEn3, y: SEn3):
    return (x.inverse() @ y).log().reshape(-1)


register_manifold(SEn3, Manifold(
    dims=_sen3_dims,
    retract=_sen3_retract,
    local=_sen3_local,
))
