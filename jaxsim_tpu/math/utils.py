"""AD-safe norm (reference: ``src/jaxsim/math/utils.py:7-60``).

``safe_norm`` returns ‖x‖ with a custom JVP whose tangent is exactly zero at
x = 0, avoiding the NaN gradient of ``jnp.linalg.norm`` at the origin — load
bearing for Rodrigues' formula and contact math under AD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp


@functools.lru_cache(maxsize=None)
def _make_safe_norm(axis, keepdims):
    @jax.custom_jvp
    def _safe_norm(array: jtp.ArrayLike) -> jtp.Array:
        return jnp.linalg.norm(array, axis=axis, keepdims=keepdims)

    @_safe_norm.defjvp
    def _safe_norm_jvp(primals, tangents):
        (x,), (x_dot,) = primals, tangents
        is_zero = jnp.all(x == 0.0)
        safe = jnp.where(is_zero, jnp.ones_like(x), x)
        norm = jnp.linalg.norm(safe, axis=axis, keepdims=keepdims)
        dot = jnp.sum(safe * x_dot, axis=axis, keepdims=keepdims)
        tangent = jnp.where(is_zero, 0.0, dot / norm)
        return jnp.where(is_zero, 0.0, norm), tangent

    return _safe_norm


def safe_norm(array: jtp.ArrayLike, *, axis=None, keepdims: bool = False) -> jtp.Array:
    """Norm of ``array`` along ``axis`` with zero gradient at the origin."""
    return _make_safe_norm(axis, keepdims)(array)
