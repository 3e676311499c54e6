"""Articulated-Body Algorithm: O(n) floating-base forward dynamics.

Role of reference ``src/jaxsim/rbda/aba.py:12-292`` (Featherstone §7.3/§9.4):
three sweeps over the kinematic tree. Gravity uses the classic trick of
biasing the base acceleration instead of applying per-link forces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
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
    W_v_WB = jnp.asarray(base_velocity_inertial, dtype=float)
    W_g = gravity_sixd(gravity)

    lam = kdp.parent_array
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

    v = jnp.zeros((n_links, 6))
    c = jnp.zeros((n_links, 6))
    pA = jnp.zeros((n_links, 6))
    MA = jnp.zeros((n_links, 6, 6))
    i_X_0 = jnp.zeros((n_links, 6, 6)).at[0].set(jnp.eye(6))

    if floating_base:
        v = v.at[0].set(mv(B_X_W, W_v_WB))
        MA = MA.at[0].set(M[0])
        pA_0 = mv(Cross.vx_star(v[0]) @ M[0], v[0]) - mtv(W_X_B, W_f[0])
        pA = pA.at[0].set(pA_0)

    # Pass 1 (forward): velocities, bias terms, external forces.
    def pass1(carry, i):
        v, c, MA, pA, i_X_0 = carry
        vJ = S[i] * sd[i - 1]
        v_i = mv(i_X_li[i], v[lam[i]]) + vJ
        v = v.at[i].set(v_i)
        c = c.at[i].set(mv(Cross.vx(v_i), vJ))
        MA = MA.at[i].set(M[i])
        i_X_0i = i_X_li[i] @ i_X_0[lam[i]]
        i_X_0 = i_X_0.at[i].set(i_X_0i)
        i_Xf_W = Adjoint.inverse(i_X_0i @ B_X_W).T
        pA_i = mv(Cross.vx_star(v_i) @ M[i], v_i) - mv(i_Xf_W, W_f[i])
        pA = pA.at[i].set(pA_i)
        return (v, c, MA, pA, i_X_0), None

    if n_links > 1:
        (v, c, MA, pA, i_X_0), _ = jax.lax.scan(
            pass1, (v, c, MA, pA, i_X_0), jnp.arange(1, n_links)
        )

    # Pass 2 (backward): articulated inertias.
    U = jnp.zeros((n_links, 6))
    d = jnp.ones(n_links)
    u = jnp.zeros(n_links)

    def pass2(carry, i):
        U, d, u, MA, pA = carry
        U_i = mv(MA[i], S[i])
        d_i = jnp.dot(S[i], U_i)
        u_i = tau[i - 1] - jnp.dot(S[i], pA[i])
        U = U.at[i].set(U_i)
        d = d.at[i].set(d_i)
        u = u.at[i].set(u_i)

        Ma = MA[i] - jnp.outer(U_i, U_i) / d_i
        pa = pA[i] + mv(Ma, c[i]) + U_i * (u_i / d_i)

        def propagate(MA_pA):
            MA, pA = MA_pA
            X = i_X_li[i]
            MA = MA.at[lam[i]].set(MA[lam[i]] + X.T @ Ma @ X)
            pA = pA.at[lam[i]].set(pA[lam[i]] + mtv(X, pa))
            return MA, pA

        MA, pA = jax.lax.cond(
            jnp.logical_or(lam[i] != 0, floating_base),
            propagate,
            lambda MA_pA: MA_pA,
            (MA, pA),
        )
        return (U, d, u, MA, pA), None

    if n_links > 1:
        (U, d, u, MA, pA), _ = jax.lax.scan(
            pass2, (U, d, u, MA, pA), jnp.arange(n_links - 1, 0, -1)
        )

    # Base acceleration.
    if floating_base:
        a0 = jnp.linalg.solve(-MA[0], pA[0])
    else:
        a0 = -mv(B_X_W, W_g)

    # Pass 3 (forward): accelerations.
    a = jnp.zeros((n_links, 6)).at[0].set(a0)
    sdd = jnp.zeros(n_joints)

    def pass3(carry, i):
        a, sdd = carry
        a_i = mv(i_X_li[i], a[lam[i]]) + c[i]
        sdd_i = (u[i] - jnp.dot(U[i], a_i)) / d[i]
        sdd = sdd.at[i - 1].set(sdd_i)
        a = a.at[i].set(a_i + S[i] * sdd_i)
        return (a, sdd), None

    if n_links > 1:
        (a, sdd), _ = jax.lax.scan(pass3, (a, sdd), jnp.arange(1, n_links))

    if floating_base:
        W_a_WB = mv(W_X_B, a[0]) + W_g
    else:
        W_a_WB = jnp.zeros(6)

    return W_a_WB, sdd
