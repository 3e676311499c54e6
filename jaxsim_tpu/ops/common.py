"""Shared helpers for the RBDA kernels."""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp


def mv(A: jtp.Matrix, x: jtp.Vector) -> jtp.Vector:
    """Batched matrix–vector product on trailing dims."""
    return jnp.einsum("...ij,...j->...i", A, x)


def mtv(A: jtp.Matrix, x: jtp.Vector) -> jtp.Vector:
    """Batched Aᵀ x on trailing dims."""
    return jnp.einsum("...ji,...j->...i", A, x)


def gravity_sixd(gravity: jtp.VectorLike) -> jtp.Vector:
    """3D gravity → 6D spatial acceleration [g; 0] (linear-first)."""
    g = jnp.asarray(gravity, dtype=float)
    return jnp.concatenate([g, jnp.zeros_like(g)], axis=-1)
