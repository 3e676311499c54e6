"""Recursive Newton-Euler: O(n) floating-base inverse dynamics.

Role of reference ``src/jaxsim/rbda/rnea.py:12-238``: forward sweep of
velocities/accelerations/forces, backward force accumulation. Returns the
base wrench (world frame) and joint torques.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu import exceptions
from jaxsim_tpu.math import Adjoint, Cross

from .common import gravity_sixd, mtv, mv


def rnea(
    kdp,
    *,
    base_transform: jtp.MatrixLike,
    joint_positions: jtp.VectorLike,
    base_velocity_inertial: jtp.VectorLike,
    joint_velocities: jtp.VectorLike,
    base_acceleration_inertial: jtp.VectorLike | None = None,
    joint_accelerations: jtp.VectorLike | None = None,
    link_forces_inertial: jtp.MatrixLike | None = None,
    gravity: jtp.VectorLike = (0.0, 0.0, -9.81),
    floating_base: bool = True,
) -> tuple[jtp.Vector, jtp.Vector]:
    """Inverse dynamics: generalized forces producing the given accelerations.

    Returns ``(W_f_B (6,), τ (n,))``.
    """
    n_links = kdp.number_of_links()
    n_joints = kdp.number_of_joints()

    s = jnp.asarray(joint_positions, dtype=float)
    sd = jnp.asarray(joint_velocities, dtype=float)
    sdd = (
        jnp.asarray(joint_accelerations, dtype=float)
        if joint_accelerations is not None
        else jnp.zeros(n_joints)
    )
    W_f = (
        jnp.asarray(link_forces_inertial, dtype=float)
        if link_forces_inertial is not None
        else jnp.zeros((n_links, 6))
    )
    W_H_B = jnp.asarray(base_transform, dtype=float)
    # Runtime validation (CPU opt-in): mirrors the reference's
    # process_inputs quaternion checks (rbda/utils.py:136-146).
    exceptions.validate_base_transform(W_H_B)
    W_v_WB = jnp.asarray(base_velocity_inertial, dtype=float)
    W_vd_WB = (
        jnp.asarray(base_acceleration_inertial, dtype=float)
        if base_acceleration_inertial is not None
        else jnp.zeros(6)
    )
    W_g = gravity_sixd(gravity)

    lam = tuple(int(x) for x in kdp.parent_array_static)
    S = kdp.motion_subspaces
    M = kdp.link_parameters.spatial_inertia()

    i_X_li = kdp.joint_transforms(joint_positions=s, base_transform=W_H_B)
    # The kinematic base frame is the base LINK frame, which includes the
    # optional root offset suc_H_i[0] (non-identity for models whose base
    # link pose differs from the model root, e.g. fixed-base with a world
    # offset). joint_transforms row 0 composes it; force/velocity transforms
    # here must use the same frame.
    W_H_B0 = W_H_B @ kdp.joint_model.suc_H_i[0]
    W_X_B = Adjoint.from_transform(W_H_B0)
    B_X_W = Adjoint.from_transform(W_H_B0, inverse=True)

    # Unrolled over the static parent array (no scan carry of (nL, 6, 6)
    # buffers — see ops/aba.py for the rationale).
    zero6 = jnp.zeros(6)
    v = [zero6] * n_links
    a = [-mv(B_X_W, W_g)] + [zero6] * (n_links - 1)
    f = [zero6] * n_links

    if floating_base:
        v[0] = mv(B_X_W, W_v_WB)
        a[0] = mv(B_X_W, W_vd_WB - W_g)
        f[0] = (
            mv(M[0], a[0])
            + mv(Cross.vx_star(v[0]) @ M[0], v[0])
            - mtv(W_X_B, W_f[0])
        )

    i_X_0 = [jnp.eye(6)] + [None] * (n_links - 1)
    for i in range(1, n_links):
        vJ = S[i] * sd[i - 1]
        v[i] = mv(i_X_li[i], v[lam[i]]) + vJ
        a[i] = mv(i_X_li[i], a[lam[i]]) + S[i] * sdd[i - 1] + mv(Cross.vx(v[i]), vJ)
        i_X_0[i] = i_X_li[i] @ i_X_0[lam[i]]
        i_Xf_W = Adjoint.inverse(i_X_0[i] @ B_X_W).T
        f[i] = (
            mv(M[i], a[i])
            + mv(Cross.vx_star(v[i]) @ M[i], v[i])
            - mv(i_Xf_W, W_f[i])
        )

    tau = [jnp.asarray(0.0)] * n_joints
    for i in range(n_links - 1, 0, -1):
        tau[i - 1] = jnp.dot(S[i], f[i])
        if lam[i] != 0 or floating_base:
            f[lam[i]] = f[lam[i]] + mtv(i_X_li[i], f[i])

    # Base wrench, expressed in the world frame.
    W_f0 = mtv(B_X_W, f[0])
    return W_f0, (jnp.stack(tau) if n_joints else jnp.zeros(0))
