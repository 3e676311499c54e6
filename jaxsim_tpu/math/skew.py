"""Skew-symmetric (wedge/vee) operators, batched over leading dims.

Feature parity with reference ``src/jaxsim/math/skew.py:11-72``.
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp


class Skew:
    """3-vector ↔ skew-symmetric matrix maps."""

    @staticmethod
    def wedge(vector: jtp.VectorLike) -> jtp.Matrix:
        """Map ``(..., 3)`` vectors to ``(..., 3, 3)`` skew matrices."""
        v = jnp.asarray(vector)
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        zero = jnp.zeros_like(x)
        rows = jnp.stack(
            [
                jnp.stack([zero, -z, y], axis=-1),
                jnp.stack([z, zero, -x], axis=-1),
                jnp.stack([-y, x, zero], axis=-1),
            ],
            axis=-2,
        )
        return rows

    @staticmethod
    def vee(matrix: jtp.MatrixLike) -> jtp.Vector:
        """Map ``(..., 3, 3)`` matrices to ``(..., 3)`` vectors (antisymmetric part)."""
        m = jnp.asarray(matrix)
        return 0.5 * jnp.stack(
            [
                m[..., 2, 1] - m[..., 1, 2],
                m[..., 0, 2] - m[..., 2, 0],
                m[..., 1, 0] - m[..., 0, 1],
            ],
            axis=-1,
        )
