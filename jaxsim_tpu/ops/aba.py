"""Articulated-Body Algorithm: O(n) floating-base forward dynamics.

Role of reference ``src/jaxsim/rbda/aba.py:12-292`` (Featherstone §7.3/§9.4):
three sweeps over the kinematic tree. Gravity uses the classic trick of
biasing the base acceleration instead of applying per-link forces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu import exceptions
from jaxsim_tpu.math import Adjoint, Cross

from .common import gravity_sixd, mtv, mv


def aba(
    kdp,
    *,
    base_transform: jtp.MatrixLike,
    joint_positions: jtp.VectorLike,
    base_velocity_inertial: jtp.VectorLike,
    joint_velocities: jtp.VectorLike,
    joint_forces: jtp.VectorLike | None = None,
    link_forces_inertial: jtp.MatrixLike | None = None,
    gravity: jtp.VectorLike = (0.0, 0.0, -9.81),
    floating_base: bool = True,
) -> tuple[jtp.Vector, jtp.Vector]:
    """Forward dynamics.

    Args:
        kdp: The model's :class:`KinDynParameters`.
        base_transform: ``(4, 4)`` world→base pose (unit quaternion assumed).
        joint_positions/joint_velocities: ``(n,)``.
        base_velocity_inertial: ``(6,)`` inertial-fixed base velocity.
        joint_forces: ``(n,)`` joint generalized forces.
        link_forces_inertial: ``(nL, 6)`` external 6D forces, world frame.
        gravity: 3D gravity vector.
        floating_base: static flag.

    Returns:
        ``(W_a_WB (6,), s̈ (n,))`` — inertial base acceleration (gravity
        included) and joint accelerations.
    """
    n_links = kdp.number_of_links()
    n_joints = kdp.number_of_joints()

    s = jnp.asarray(joint_positions, dtype=float)
    sd = jnp.asarray(joint_velocities, dtype=float)
    tau = (
        jnp.asarray(joint_forces, dtype=float)
        if joint_forces is not None
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

    # The tree sweeps are UNROLLED over the static parent array: under vmap
    # a lax.scan would carry whole (B, nL, 6, 6) buffers through 3×nL
    # sequential steps of gathers + dynamic-update-slices, which is
    # latency-bound on TPU. Unrolling keeps every per-link quantity in SSA
    # form (no scatters), letting XLA overlap the chain (~4× faster for the
    # 23-DoF humanoid under vmap; numerics identical; reverse-AD friendly).
    zero6 = jnp.zeros(6)

    v = [zero6] * n_links
    c = [zero6] * n_links
    pA = [zero6] * n_links
    MA = [jnp.zeros((6, 6))] * n_links

    if floating_base:
        v[0] = mv(B_X_W, W_v_WB)
        MA[0] = M[0]
        pA[0] = mv(Cross.vx_star(v[0]) @ M[0], v[0]) - mtv(W_X_B, W_f[0])

    # Pass 1 (forward): velocities, bias terms, external forces.
    i_X_0 = [jnp.eye(6)] + [None] * (n_links - 1)
    for i in range(1, n_links):
        vJ = S[i] * sd[i - 1]
        v[i] = mv(i_X_li[i], v[lam[i]]) + vJ
        c[i] = mv(Cross.vx(v[i]), vJ)
        MA[i] = M[i]
        i_X_0[i] = i_X_li[i] @ i_X_0[lam[i]]
        i_Xf_W = Adjoint.inverse(i_X_0[i] @ B_X_W).T
        pA[i] = mv(Cross.vx_star(v[i]) @ M[i], v[i]) - mv(i_Xf_W, W_f[i])

    # Pass 2 (backward): articulated inertias.
    U = [zero6] * n_links
    d = [jnp.asarray(1.0)] * n_links
    u = [jnp.asarray(0.0)] * n_links

    for i in range(n_links - 1, 0, -1):
        U[i] = mv(MA[i], S[i])
        d[i] = jnp.dot(S[i], U[i])
        u[i] = tau[i - 1] - jnp.dot(S[i], pA[i])

        Ma = MA[i] - jnp.outer(U[i], U[i]) / d[i]
        pa = pA[i] + mv(Ma, c[i]) + U[i] * (u[i] / d[i])

        if lam[i] != 0 or floating_base:
            X = i_X_li[i]
            MA[lam[i]] = MA[lam[i]] + X.T @ Ma @ X
            pA[lam[i]] = pA[lam[i]] + mtv(X, pa)

    # Base acceleration.
    if floating_base:
        a0 = jnp.linalg.solve(-MA[0], pA[0])
    else:
        a0 = -mv(B_X_W, W_g)

    # Pass 3 (forward): accelerations.
    a = [a0] + [None] * (n_links - 1)
    sdd = [jnp.asarray(0.0)] * n_joints

    for i in range(1, n_links):
        a_i = mv(i_X_li[i], a[lam[i]]) + c[i]
        sdd[i - 1] = (u[i] - jnp.dot(U[i], a_i)) / d[i]
        a[i] = a_i + S[i] * sdd[i - 1]

    sdd = jnp.stack(sdd) if n_joints else jnp.zeros(0)

    if floating_base:
        W_a_WB = mv(W_X_B, a[0]) + W_g
    else:
        W_a_WB = jnp.zeros(6)

    return W_a_WB, sdd
