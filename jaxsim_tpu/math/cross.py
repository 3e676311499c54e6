"""6D spatial cross products, batched, linear-first convention.

For ν = [v; ω] (reference ``src/jaxsim/math/cross.py``):

    ν×  = [[ω̂, v̂], [0, ω̂]]      (motion cross product)
    ν×* = -（ν×)ᵀ = [[ω̂, 0], [v̂, ω̂]]   (force cross product)
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .skew import Skew


class Cross:
    """Spatial cross-product matrices; batched over leading dims."""

    @staticmethod
    def vx(velocity_sixd: jtp.VectorLike) -> jtp.Matrix:
        nu = jnp.asarray(velocity_sixd)
        v, w = nu[..., 0:3], nu[..., 3:6]
        vw, ww = Skew.wedge(v), Skew.wedge(w)
        zero = jnp.zeros_like(ww)
        top = jnp.concatenate([ww, vw], axis=-1)
        bot = jnp.concatenate([zero, ww], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    @staticmethod
    def vx_star(velocity_sixd: jtp.VectorLike) -> jtp.Matrix:
        return -jnp.swapaxes(Cross.vx(velocity_sixd), -1, -2)
