"""6×6 spatial adjoints, batched, linear-first convention.

Convention (matches reference ``src/jaxsim/math/adjoint.py``): a 6D motion
vector is [v; ω] (linear first) and the adjoint of A_H_B = (R, p) is

    A_X_B = [[R, p̂ R], [0, R]]
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .quaternion import Quaternion
from .skew import Skew


class Adjoint:
    """6×6 adjoint builders/converters; batched over leading dims."""

    @staticmethod
    def from_quaternion_and_translation(
        quaternion: jtp.VectorLike | None = None,
        translation: jtp.VectorLike | None = None,
        inverse: bool = False,
        normalize_quaternion: bool = False,
    ) -> jtp.Matrix:
        q = (
            jnp.asarray(quaternion)
            if quaternion is not None
            else jnp.array([1.0, 0.0, 0.0, 0.0])
        )
        p = jnp.asarray(translation) if translation is not None else jnp.zeros(3)
        if normalize_quaternion:
            q = Quaternion.normalize(q)
        return Adjoint.from_rotation_and_translation(
            Quaternion.to_dcm(q), p, inverse=inverse
        )

    @staticmethod
    def from_transform(transform: jtp.MatrixLike, inverse: bool = False) -> jtp.Matrix:
        H = jnp.asarray(transform)
        return Adjoint.from_rotation_and_translation(
            H[..., :3, :3], H[..., :3, 3], inverse=inverse
        )

    @staticmethod
    def from_rotation_and_translation(
        rotation: jtp.MatrixLike | None = None,
        translation: jtp.VectorLike | None = None,
        inverse: bool = False,
    ) -> jtp.Matrix:
        R = jnp.asarray(rotation) if rotation is not None else jnp.eye(3)
        p = jnp.asarray(translation) if translation is not None else jnp.zeros(3)
        batch = jnp.broadcast_shapes(R.shape[:-2], p.shape[:-1])
        R = jnp.broadcast_to(R, batch + (3, 3))
        p = jnp.broadcast_to(p, batch + (3,))
        pw = Skew.wedge(p)
        zero = jnp.zeros_like(R)
        if not inverse:
            # A_X_B = [[R, p̂R], [0, R]]
            top = jnp.concatenate([R, pw @ R], axis=-1)
            bot = jnp.concatenate([zero, R], axis=-1)
        else:
            # B_X_A = [[Rᵀ, -Rᵀp̂], [0, Rᵀ]]
            Rt = jnp.swapaxes(R, -1, -2)
            top = jnp.concatenate([Rt, -Rt @ pw], axis=-1)
            bot = jnp.concatenate([zero, Rt], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    @staticmethod
    def to_transform(adjoint: jtp.MatrixLike) -> jtp.Matrix:
        X = jnp.asarray(adjoint)
        R = X[..., 0:3, 0:3]
        pxR = X[..., 0:3, 3:6]
        p = Skew.vee(pxR @ jnp.swapaxes(R, -1, -2))
        top = jnp.concatenate([R, p[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=X.dtype), top[..., :1, :].shape
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def inverse(adjoint: jtp.MatrixLike) -> jtp.Matrix:
        """Closed-form inverse exploiting the adjoint structure
        (reference ``math/adjoint.py:138-160``)."""
        X = jnp.asarray(adjoint)
        Rt = jnp.swapaxes(X[..., 0:3, 0:3], -2, -1)
        pxR = X[..., 0:3, 3:6]
        top = jnp.concatenate([Rt, -Rt @ pxR @ Rt], axis=-1)
        bot = jnp.concatenate([jnp.zeros_like(Rt), Rt], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
