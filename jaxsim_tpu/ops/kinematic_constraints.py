"""Weld-constraint solver.

Role of reference ``src/jaxsim/rbda/kinematic_constraints.py:19-345``: for
each constrained frame pair, solve the regularized Delassus system
``(J M⁻¹ Jᵀ + R) x = −(J ν̇_free + baumgarte)`` in mixed representation and
return equal/opposite inertial wrenches for the parent links.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint, Rotation, Transform


def compute_constraint_wrenches(
    model,
    data,
    *,
    link_forces_inertial: jtp.MatrixLike | None = None,
    joint_force_references: jtp.VectorLike | None = None,
    regularization: jtp.FloatLike = 1e-3,
) -> tuple[jtp.Matrix, jnp.ndarray]:
    """Return ``(wrenches (2·nc, 6) inertial, parent_link_indices (2·nc,))``."""
    from jaxsim_tpu.api import model as js_model
    from jaxsim_tpu.api.common import (
        VelRepr,
        other_representation_to_inertial,
    )

    constraints = model.kin_dyn_parameters.constraints
    nc = len(constraints)
    if nc == 0:
        return jnp.zeros((0, 6)), jnp.zeros(0, dtype=int)

    nl = model.number_of_links()
    fp = model.kin_dyn_parameters.frame_parameters

    # Static parent links and frame offsets.
    k1 = [i - nl for i in constraints.frame_idxs_1]
    k2 = [i - nl for i in constraints.frame_idxs_2]
    parents_1 = jnp.array([fp.body[k] for k in k1], dtype=int)
    parents_2 = jnp.array([fp.body[k] for k in k2], dtype=int)
    L_H_F1 = fp.transform[jnp.array(k1, dtype=int)]
    L_H_F2 = fp.transform[jnp.array(k2, dtype=int)]

    W_H_L = data._link_transforms
    W_H_F1 = W_H_L[parents_1] @ L_H_F1  # (nc, 4, 4)
    W_H_F2 = W_H_L[parents_2] @ L_H_F2

    tau = (
        jnp.asarray(joint_force_references, dtype=float)
        if joint_force_references is not None
        else jnp.zeros(model.number_of_joints())
    )
    W_f_L = (
        jnp.asarray(link_forces_inertial, dtype=float)
        if link_forces_inertial is not None
        else jnp.zeros((nl, 6))
    )

    data_mixed = data.replace(velocity_representation=VelRepr.Mixed)
    BW_nu = data_mixed.generalized_velocity
    M_inv = js_model.free_floating_mass_matrix_inverse(model, data_mixed)

    data_inertial = data.replace(velocity_representation=VelRepr.Inertial)
    W_ad_free, sdd_free = js_model.forward_dynamics_aba(
        model, data_inertial, joint_forces=tau, link_forces=W_f_L
    )
    BW_nud_free = jnp.concatenate(
        [
            js_model._inertial_acceleration_to_other(model, data_mixed, W_ad_free),
            sdd_free,
        ]
    )

    # Mixed-representation frame Jacobians from body-fixed link Jacobians.
    L_J_WL = js_model.generalized_free_floating_jacobian(
        model, data_mixed, output_vel_repr=VelRepr.Body
    )  # input mixed, output body (nL, 6, 6+n)

    def frame_jacobian_mixed(parent, W_H_F):
        J_L = L_J_WL[parent]
        W_H_parent = W_H_L[parent]
        F_H_L = Transform.inverse(W_H_F) @ W_H_parent
        FW_H_F = W_H_F.at[0:3, 3].set(jnp.zeros(3))
        FW_H_L = FW_H_F @ F_H_L
        FW_X_L = Adjoint.from_transform(FW_H_L)
        return FW_X_L @ J_L

    J1 = jax.vmap(frame_jacobian_mixed)(parents_1, W_H_F1)
    J2 = jax.vmap(frame_jacobian_mixed)(parents_2, W_H_F2)
    J_constr = J1 - J2  # (nc, 6, 6+n)

    # Baumgarte stabilization per constraint.
    def baumgarte(J, W_H_F1, W_H_F2, K_P, K_D):
        vel_error = J @ BW_nu
        position_error = W_H_F1[0:3, 3] - W_H_F2[0:3, 3]
        R_error = W_H_F2[0:3, 0:3].T @ W_H_F1[0:3, 0:3]
        orientation_error = Rotation.log_vee(R_error)
        return (
            K_P * jnp.concatenate([position_error, orientation_error])
            + K_D * vel_error
        )

    b_baumgarte = jax.vmap(baumgarte)(
        J_constr, W_H_F1, W_H_F2, constraints.K_P, constraints.K_D
    ).flatten()

    J_flat = J_constr.reshape(6 * nc, -1)
    G = J_flat @ M_inv @ J_flat.T
    A = G + regularization * jnp.eye(6 * nc)
    b = J_flat @ BW_nud_free + b_baumgarte

    x = jnp.linalg.solve(A, -b).reshape(nc, 6)

    # Equal/opposite wrenches, mixed → inertial.
    w1 = other_representation_to_inertial(x, VelRepr.Mixed, W_H_F1, is_force=True)
    w2 = other_representation_to_inertial(-x, VelRepr.Mixed, W_H_F2, is_force=True)

    wrenches = jnp.concatenate([w1, w2], axis=0)  # (2·nc, 6)
    parent_indices = jnp.concatenate([parents_1, parents_2])
    return wrenches, parent_indices
