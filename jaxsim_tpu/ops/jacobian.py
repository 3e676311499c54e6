"""Free-floating Jacobians (doubly-left) and their derivatives.

Role of reference ``src/jaxsim/rbda/jacobian.py:12-339``. One forward sweep
produces the base→link adjoints ``B_X_i`` (and their derivatives); Jacobian
columns then come out of a single batched einsum — per-link Jacobians are
column-masked with the static support matrix κb downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint, Cross

from .common import mv


def base_kinematics_sweep(
    kdp,
    *,
    joint_positions: jtp.VectorLike,
    joint_velocities: jtp.VectorLike | None = None,
) -> tuple[jtp.Array, jtp.Array | None, jtp.Array | None]:
    """Forward sweep returning ``B_X_i (nL,6,6)`` base→link adjoints, and —
    when joint velocities are given — ``B_v_Bi (nL,6)`` body-relative link
    velocities and ``B_Ẋ_i (nL,6,6)`` adjoint derivatives."""
    s = jnp.asarray(joint_positions, dtype=float)
    n_links = kdp.number_of_links()
    lam = tuple(int(x) for x in kdp.parent_array_static)
    S = kdp.motion_subspaces

    i_X_li = kdp.joint_transforms(joint_positions=s, base_transform=jnp.eye(4))
    li_X_i = Adjoint.inverse(i_X_li)

    # Unrolled over the static parent array (no scan carry of (nL, 6, 6)
    # buffers — see ops/aba.py for the rationale).
    B_X_i = [jnp.eye(6)] + [None] * (n_links - 1)

    if joint_velocities is None:
        for i in range(1, n_links):
            B_X_i[i] = B_X_i[lam[i]] @ li_X_i[i]
        return jnp.stack(B_X_i), None, None

    sd = jnp.asarray(joint_velocities, dtype=float)
    B_v_Bi = [jnp.zeros(6)] + [None] * (n_links - 1)
    B_Xd_i = [jnp.zeros((6, 6))] + [None] * (n_links - 1)

    for i in range(1, n_links):
        B_X_i[i] = B_X_i[lam[i]] @ li_X_i[i]
        B_v_Bi[i] = B_v_Bi[lam[i]] + mv(B_X_i[i], S[i]) * sd[i - 1]
        i_v = mv(Adjoint.inverse(B_X_i[i]), B_v_Bi[i])
        B_Xd_i[i] = B_X_i[i] @ Cross.vx(i_v)

    return jnp.stack(B_X_i), jnp.stack(B_v_Bi), jnp.stack(B_Xd_i)


def jacobian_full_doubly_left(
    kdp, *, joint_positions: jtp.VectorLike
) -> tuple[jtp.Matrix, jtp.Array]:
    """Full doubly-left Jacobian ``B_J (6, 6+n)`` (first 6 columns identity)
    plus ``B_H_L (nL,4,4)`` link poses w.r.t. the base."""
    B_X_i, _, _ = base_kinematics_sweep(kdp, joint_positions=joint_positions)
    S = kdp.motion_subspaces
    n = kdp.number_of_joints()

    # Column 6+ii = B_X_i S_i for joint i = ii+1; fully batched.
    cols = jnp.einsum("nij,nj->in", B_X_i[1:], S[1:]) if n > 0 else jnp.zeros((6, 0))
    J = jnp.concatenate([jnp.eye(6), cols], axis=1)
    B_H_L = Adjoint.to_transform(B_X_i)
    return J, B_H_L


def jacobian_derivative_full_doubly_left(
    kdp,
    *,
    joint_positions: jtp.VectorLike,
    joint_velocities: jtp.VectorLike,
) -> tuple[jtp.Matrix, jtp.Array]:
    """Full doubly-left Jacobian derivative ``B_J̇ (6, 6+n)`` plus ``B_H_L``."""
    B_X_i, _, B_Xd_i = base_kinematics_sweep(
        kdp, joint_positions=joint_positions, joint_velocities=joint_velocities
    )
    S = kdp.motion_subspaces
    n = kdp.number_of_joints()

    cols = (
        jnp.einsum("nij,nj->in", B_Xd_i[1:], S[1:]) if n > 0 else jnp.zeros((6, 0))
    )
    Jd = jnp.concatenate([jnp.zeros((6, 6)), cols], axis=1)
    B_H_L = Adjoint.to_transform(B_X_i)
    return Jd, B_H_L


def link_jacobians_doubly_left(
    kdp, *, joint_positions: jtp.VectorLike
) -> tuple[jtp.Array, jtp.Array]:
    """Per-link doubly-left Jacobians ``(nL, 6, 6+n)``: the full Jacobian with
    columns masked by the static support matrix κb."""
    J_full, B_H_L = jacobian_full_doubly_left(kdp, joint_positions=joint_positions)
    kb = kdp.support_body_array_bool  # (nL, nL)
    n = kdp.number_of_joints()
    # Column mask per link: 6 base columns always on; joint col j on iff
    # link (j+1) supports L.
    base_mask = jnp.ones((kdp.number_of_links(), 6), dtype=bool)
    joint_mask = kb[:, 1 : 1 + n]
    mask = jnp.concatenate([base_mask, joint_mask], axis=1)  # (nL, 6+n)
    return jnp.where(mask[:, None, :], J_full[None, :, :], 0.0), B_H_L
