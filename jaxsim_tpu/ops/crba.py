"""Composite Rigid-Body Algorithm: free-floating mass matrix (body-fixed).

Role of reference ``src/jaxsim/rbda/crba.py:10-170``, redesigned TPU-first:
the reference's O(n²) sequential "fake while" inner scan is replaced with
batched einsums over the static boolean support matrix κb — all off-diagonal
blocks are computed at once:

    M0[L]   = B_X_Lᵀ⁻ᵀ-transported link inertias (base frame)
    Mc0[k]  = Σ_{L ∈ subtree(k)} M0[L]         (one einsum over κb)
    col_i   = B_X_i S_i                        (Jacobian columns, base frame)
    F_i     = Mc0[i] col_i
    M_ij    = col_jᵀ F_i  for j ∈ κ(i), symmetrized

This is mathematically identical (M = Σ_L J_Lᵀ M_L J_L) but embarrassingly
parallel and reverse-AD-friendly with no control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint

from .jacobian import base_kinematics_sweep


def crba(kdp, *, joint_positions: jtp.VectorLike) -> jtp.Matrix:
    """Mass matrix ``M (6+n, 6+n)`` in body-fixed representation."""
    n = kdp.number_of_joints()

    B_X_i, _, _ = base_kinematics_sweep(kdp, joint_positions=joint_positions)
    i_X_B = Adjoint.inverse(B_X_i)  # (nL, 6, 6)

    M_links = kdp.link_parameters.spatial_inertia()  # (nL, 6, 6)

    # Link inertias transported to the base frame: M0 = i_X_Bᵀ M_L i_X_B.
    M0 = jnp.einsum("lki,lkm,lmj->lij", i_X_B, M_links, i_X_B)

    # Composite inertia of every subtree (κb[L, k] ⇔ L ∈ subtree(k)).
    kb = kdp.support_body_array_bool.astype(M0.dtype)  # (nL, nL)
    Mc0 = jnp.einsum("lk,lij->kij", kb, M0)  # (nL, 6, 6)

    # Base block: composite inertia of the whole model at the base.
    M_BB = Mc0[0]

    if n == 0:
        return M_BB

    S = kdp.motion_subspaces
    cols = jnp.einsum("nij,nj->ni", B_X_i[1:], S[1:])  # (n, 6) base-frame columns

    # F_i = Mc0[joint child] col_i: base-frame force of unit joint-i accel.
    F = jnp.einsum("nij,nj->ni", Mc0[1:], cols)  # (n, 6)

    # Joint-joint block: M_ij = col_jᵀ F_i for ancestor pairs, symmetrized.
    Mjj_lower = jnp.einsum("ni,mi->nm", F, cols)  # (n, n): row i, col j
    anc = kdp.support_body_array_bool[1:, 1:]  # anc[i, j] ⇔ joint j ∈ κ(child(i))
    Mjj_masked = jnp.where(anc, Mjj_lower, 0.0)
    diag = jnp.diagonal(Mjj_masked)
    Mjj = Mjj_masked + Mjj_masked.T - jnp.diag(diag)

    # Base-joint coupling: F_i is already the base-frame wrench.
    M_Bj = F.T  # (6, n)

    top = jnp.concatenate([M_BB, M_Bj], axis=1)
    bottom = jnp.concatenate([M_Bj.T, Mjj], axis=1)
    return jnp.concatenate([top, bottom], axis=0)
