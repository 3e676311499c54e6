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
        # The zero test must be per reduced slice (elementwise on the norm),
        # NOT on the whole array — a batch mixing zero and nonzero slices
        # would otherwise produce 0/0 tangents for the zero slices (the
        # reference's whole-array test, ``math/utils.py:27-40``, is only
        # correct because it vmaps scalar points).
        norm = jnp.linalg.norm(x, axis=axis, keepdims=keepdims)
        dot = jnp.sum(x * x_dot, axis=axis, keepdims=keepdims)
        is_zero = norm == 0.0
        tangent = jnp.where(is_zero, 0.0, dot / jnp.where(is_zero, 1.0, norm))
        return norm, tangent

    return _safe_norm


def safe_norm(array: jtp.ArrayLike, *, axis=None, keepdims: bool = False) -> jtp.Array:
    """Norm of ``array`` along ``axis`` with zero gradient at the origin."""
    return _make_safe_norm(axis, keepdims)(array)
