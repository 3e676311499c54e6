"""Inverse of the free-floating mass matrix.

The reference implements an O(n) ABA-style factorization
(``src/jaxsim/rbda/mass_inverse.py:11-233``, Carpentier HAL-01790934) to avoid
an O(n³) dense solve. On TPU, for the model sizes this framework targets
(n ≲ 100), a batched Cholesky inverse of the CRBA matrix is faster in
wall-clock than a 29-step sequential scan and is exactly reverse-AD-safe, so
that is the default here; both produce M⁻¹ in body-fixed representation.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg

import jaxsim_tpu.typing as jtp

from .crba import crba


def mass_inverse(
    kdp, *, joint_positions: jtp.VectorLike, floating_base: bool = True
) -> jtp.Matrix:
    """M⁻¹ ``(6+n, 6+n)`` in body-fixed representation.

    For fixed-base models the base rows/cols are zeroed (the base cannot
    accelerate), matching the reference's usage in contact solvers.
    """
    M = crba(kdp, joint_positions=joint_positions)
    n_full = M.shape[-1]

    if floating_base:
        L = jax.scipy.linalg.cho_factor(M, lower=True)
        return jax.scipy.linalg.cho_solve(L, jnp.eye(n_full, dtype=M.dtype))

    # Fixed base: invert only the joint block.
    Mjj = M[6:, 6:]
    if Mjj.shape[-1] == 0:
        return jnp.zeros_like(M)
    L = jax.scipy.linalg.cho_factor(Mjj, lower=True)
    Minv_jj = jax.scipy.linalg.cho_solve(L, jnp.eye(Mjj.shape[-1], dtype=M.dtype))
    out = jnp.zeros_like(M)
    return out.at[6:, 6:].set(Minv_jj)
