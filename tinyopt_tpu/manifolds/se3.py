"""SE(3) rigid-transform manifold (rotation quaternion + translation).

Tangent dimension 6, layout ``[ρ (translation), ω (rotation)]`` with the
retraction ``T ⊞ δ = T · exp(δ̂)`` (right-multiply), matching the Sophus
convention the reference integrates (reference:
3rdparty/traits/sophus.h:30-43, tangent = [upsilon, omega]).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..manifold import Manifold, register_manifold
from .so3 import SO3, _exp_quat, _qmul

# The Taylor-guarded SO(3) left-Jacobian V(ω)·ρ / V(ω)⁻¹·t is shared with
# SE₂(3) and SEn3 — ONE numerical implementation to keep in sync
# (se23.py; no import cycle: se23 only imports so3).
from .se23 import _V_apply, _V_inv_apply


def _se3_exp(delta):
    """se(3) tangent (..., 6) -> (SO3, t), NaN-safe under AD at δ=0."""
    rho = delta[..., :3]
    omega = delta[..., 3:]
    return SO3(_exp_quat(omega)), _V_apply(omega, rho)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SE3:
    rotation: SO3
    translation: jax.Array  #: (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32, batch=()):
        return SE3(SO3.identity(dtype, batch), jnp.zeros(batch + (3,), dtype))

    @staticmethod
    def exp(delta) -> "SE3":
        R, t = _se3_exp(jnp.asarray(delta))
        return SE3(R, t)

    def log(self):
        omega = self.rotation.log()
        rho = _V_inv_apply(omega, self.translation)
        return jnp.concatenate([rho, omega], axis=-1)

    def apply(self, p):
        return self.rotation.apply(p) + self.translation

    def inverse(self) -> "SE3":
        rinv = self.rotation.inverse()
        return SE3(rinv, -rinv.apply(self.translation))

    def matrix(self):
        R = self.rotation.matrix()
        top = jnp.concatenate([R, self.translation[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype),
            top.shape[:-2] + (1, 4))
        return jnp.concatenate([top, bottom], axis=-2)

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return SE3(SO3(_qmul(self.rotation.wxyz, other.rotation.wxyz)),
                       self.rotation.apply(other.translation) + self.translation)
        return self.apply(other)


def _se3_dims(x: SE3) -> int:
    """6 per pose; leading batch axes multiply (batched SE3 leaves are
    valid parameter blocks, e.g. all camera poses of a bundle)."""
    import numpy as _np
    return 6 * int(_np.prod(x.translation.shape[:-1], dtype=int))


def _se3_retract(x: SE3, delta):
    d = SE3.exp(delta.reshape(x.translation.shape[:-1] + (6,))
                .astype(x.translation.dtype))
    return SE3(SO3(_qmul(x.rotation.wxyz, d.rotation.wxyz)),
               x.rotation.apply(d.translation) + x.translation)


def _se3_local(x: SE3, y: SE3):
    return (x.inverse() @ y).log().reshape(-1)


register_manifold(SE3, Manifold(
    dims=_se3_dims,
    retract=_se3_retract,
    local=_se3_local,
))
