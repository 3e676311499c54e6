"""Spatial inertia conversions, batched, linear-first convention.

M(m, c, I) = [[m·1, m·ĉᵀ], [m·ĉ, I + m·ĉĉᵀ]]  (reference ``math/inertia.py``),
with I the 3×3 rotational inertia about the link frame origin... note that I
here is expressed at the link frame with the CoM offset already folded in via
the parallel-axis terms.
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .skew import Skew


class Inertia:
    """mass/CoM/3×3 inertia ↔ 6×6 spatial inertia; batched."""

    @staticmethod
    def to_sixd(mass: jtp.FloatLike, com: jtp.VectorLike, I: jtp.MatrixLike) -> jtp.Matrix:
        m = jnp.asarray(mass)[..., None, None]
        c = Skew.wedge(jnp.asarray(com))
        I = jnp.asarray(I)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=I.dtype), c.shape)
        top = jnp.concatenate([m * eye, m * jnp.swapaxes(c, -1, -2)], axis=-1)
        bot = jnp.concatenate([m * c, I + m * (c @ jnp.swapaxes(c, -1, -2))], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    @staticmethod
    def to_params(M: jtp.MatrixLike) -> tuple[jtp.Float, jtp.Vector, jtp.Matrix]:
        M = jnp.asarray(M)
        m = jnp.einsum("...ii->...", M[..., 0:3, 0:3]) / 3.0
        mC = M[..., 3:6, 0:3]
        c = Skew.vee(mC) / m[..., None]
        I = M[..., 3:6, 3:6] - mC @ jnp.swapaxes(mC, -1, -2) / m[..., None, None]
        return m, c, I
