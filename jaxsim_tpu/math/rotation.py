"""Rotation matrices, batched (reference ``src/jaxsim/math/rotation.py``)."""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .quaternion import Quaternion
from .skew import Skew
from .utils import safe_norm

_EPS = 1e-6


class Rotation:
    """Rotation matrix builders; batched over leading dims."""

    @staticmethod
    def x(theta: jtp.FloatLike) -> jtp.Matrix:
        t = jnp.asarray(theta)
        c, s = jnp.cos(t), jnp.sin(t)
        one, zero = jnp.ones_like(t), jnp.zeros_like(t)
        return jnp.stack(
            [
                jnp.stack([one, zero, zero], -1),
                jnp.stack([zero, c, -s], -1),
                jnp.stack([zero, s, c], -1),
            ],
            axis=-2,
        )

    @staticmethod
    def y(theta: jtp.FloatLike) -> jtp.Matrix:
        t = jnp.asarray(theta)
        c, s = jnp.cos(t), jnp.sin(t)
        one, zero = jnp.ones_like(t), jnp.zeros_like(t)
        return jnp.stack(
            [
                jnp.stack([c, zero, s], -1),
                jnp.stack([zero, one, zero], -1),
                jnp.stack([-s, zero, c], -1),
            ],
            axis=-2,
        )

    @staticmethod
    def z(theta: jtp.FloatLike) -> jtp.Matrix:
        t = jnp.asarray(theta)
        c, s = jnp.cos(t), jnp.sin(t)
        one, zero = jnp.ones_like(t), jnp.zeros_like(t)
        return jnp.stack(
            [
                jnp.stack([c, -s, zero], -1),
                jnp.stack([s, c, zero], -1),
                jnp.stack([zero, zero, one], -1),
            ],
            axis=-2,
        )

    @staticmethod
    def from_axis_angle(vector: jtp.VectorLike) -> jtp.Matrix:
        """AD-safe Rodrigues formula on a rotation vector ``(..., 3)``.

        Uses :func:`safe_norm` plus Taylor fallbacks so both the value and the
        gradient are exact at ‖v‖ = 0 (reference ``math/rotation.py:57-85``).
        """
        v = jnp.asarray(vector)
        theta = safe_norm(v, axis=-1)[..., None, None]
        small = theta < _EPS
        theta_safe = jnp.where(small, 1.0, theta)
        # sin(θ)/θ and (1-cos(θ))/θ² with series fallbacks.
        a = jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(theta_safe) / theta_safe)
        b = jnp.where(
            small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(theta_safe)) / theta_safe**2
        )
        K = Skew.wedge(v)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
        return eye + a * K + b * (K @ K)

    @staticmethod
    def log_vee(rotation: jtp.MatrixLike) -> jtp.Vector:
        """SO(3) log of a rotation matrix as a rotation vector ``(..., 3)``."""
        return Quaternion.log(Quaternion.from_dcm(rotation))
