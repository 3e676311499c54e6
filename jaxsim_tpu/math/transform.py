"""SE(3) homogeneous transforms, batched (reference ``src/jaxsim/math/transform.py``)."""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .quaternion import Quaternion


class Transform:
    """4×4 homogeneous transform utilities; batched over leading dims."""

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
        R = Quaternion.to_dcm(q)
        return Transform.from_rotation_and_translation(R, p, inverse=inverse)

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
        if inverse:
            R = jnp.swapaxes(R, -1, -2)
            p = -jnp.einsum("...ij,...j->...i", R, p)
        top = jnp.concatenate([R, p[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top[..., :1, :].shape
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def rotation(transform: jtp.MatrixLike) -> jtp.Matrix:
        return jnp.asarray(transform)[..., :3, :3]

    @staticmethod
    def translation(transform: jtp.MatrixLike) -> jtp.Vector:
        return jnp.asarray(transform)[..., :3, 3]

    @staticmethod
    def inverse(transform: jtp.MatrixLike) -> jtp.Matrix:
        H = jnp.asarray(transform)
        R = H[..., :3, :3]
        p = H[..., :3, 3]
        return Transform.from_rotation_and_translation(R, p, inverse=True)
