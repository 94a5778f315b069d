"""SE₂(3) extended-pose manifold (rotation + velocity + position).

Counterpart of the reference's Lie++ ``SEn3<T, n>`` integration with n = 2
(reference: include/tinyopt/3rdparty/traits/lieplusplus.h:17-53) — the
standard state for IMU preintegration / inertial navigation.  Tangent
layout ``[ν (velocity), ρ (position), ω (rotation)]`` (9-dim), retraction
``X ⊞ δ = X · exp(δ)`` with the shared SO(3) left-Jacobian applied to both
translational parts.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..manifold import Manifold, register_manifold
from .so3 import SO3, _exp_quat, _qmul, _small


def _V_apply(omega, rho):
    """V(ω)·ρ where V = I + a[ω]ₓ + b[ω]ₓ² (Taylor-guarded near 0)."""
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = _small(theta2)
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    a = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta))
                  / jnp.where(small, 1.0, theta2 * theta))
    wx = jnp.cross(omega, rho)
    wwx = jnp.cross(omega, wx)
    return rho + a * wx + b * wwx


def _V_inv_apply(omega, t):
    """V(ω)⁻¹·t (Taylor-guarded)."""
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = _small(theta2)
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    cot = jnp.cos(half) / jnp.sin(jnp.where(small, 1.0, half))
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - half * cot) / jnp.where(small, 1.0, theta2))
    wt = jnp.cross(omega, t)
    wwt = jnp.cross(omega, wt)
    return t - 0.5 * wt + c * wwt


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SE23:
    rotation: SO3
    velocity: jax.Array   #: (..., 3)
    position: jax.Array   #: (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32, batch=()):
        return SE23(SO3.identity(dtype, batch),
                    jnp.zeros(batch + (3,), dtype),
                    jnp.zeros(batch + (3,), dtype))

    @staticmethod
    def exp(delta) -> "SE23":
        """Tangent (..., 9) = [ν, ρ, ω] -> SE₂(3)."""
        delta = jnp.asarray(delta)
        nu, rho, omega = delta[..., :3], delta[..., 3:6], delta[..., 6:]
        q = _exp_quat(omega)
        return SE23(SO3(q), _V_apply(omega, nu), _V_apply(omega, rho))

    def log(self) -> jax.Array:
        omega = self.rotation.log()
        nu = _V_inv_apply(omega, self.velocity)
        rho = _V_inv_apply(omega, self.position)
        return jnp.concatenate([nu, rho, omega], axis=-1)

    def inverse(self) -> "SE23":
        rinv = self.rotation.inverse()
        return SE23(rinv, -rinv.apply(self.velocity),
                    -rinv.apply(self.position))

    def __matmul__(self, other: "SE23") -> "SE23":
        return SE23(
            SO3(_qmul(self.rotation.wxyz, other.rotation.wxyz)),
            self.rotation.apply(other.velocity) + self.velocity,
            self.rotation.apply(other.position) + self.position,
        )


def _se23_dims(x: SE23) -> int:
    import numpy as _np
    return 9 * int(_np.prod(x.position.shape[:-1], dtype=int))


def _se23_retract(x: SE23, delta):
    d = SE23.exp(delta.reshape(x.position.shape[:-1] + (9,))
                 .astype(x.position.dtype))
    return x @ d


def _se23_local(x: SE23, y: SE23):
    return (x.inverse() @ y).log().reshape(-1)


register_manifold(SE23, Manifold(
    dims=_se23_dims,
    retract=_se23_retract,
    local=_se23_local,
))
