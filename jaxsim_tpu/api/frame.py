"""Frame-level API (reference ``src/jaxsim/api/frame.py``).

Frame indices live after link indices: frame k has index n_links + k
(reference ``api/frame.py:165-181``).
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint, Cross

from .common import VelRepr, inertial_to_other_representation, named_scope


def idx_of_parent_link(model, *, frame_index: jtp.IntLike) -> int:
    k = int(frame_index) - model.number_of_links()
    return model.kin_dyn_parameters.frame_parameters.body[k]


def name_to_idx(model, *, frame_name: str) -> int:
    names = model.kin_dyn_parameters.frame_parameters.name
    if frame_name not in names:
        raise ValueError(f"Frame '{frame_name}' not found in the model")
    return names.index(frame_name) + model.number_of_links()


def idx_to_name(model, *, frame_index: jtp.IntLike) -> str:
    k = int(frame_index) - model.number_of_links()
    return model.kin_dyn_parameters.frame_parameters.name[k]


def names_to_idxs(model, *, frame_names) -> jtp.Vector:
    return jnp.array(
        [name_to_idx(model, frame_name=n) for n in frame_names], dtype=int
    )


def idxs_to_names(model, *, frame_indices) -> tuple[str, ...]:
    return tuple(idx_to_name(model, frame_index=i) for i in frame_indices)


@named_scope
def transform(model, data, *, frame_index: jtp.IntLike) -> jtp.Matrix:
    """World pose of the frame: W_H_L @ L_H_F
    (reference ``frame.py:147-184``)."""
    k = int(frame_index) - model.number_of_links()
    parent = model.kin_dyn_parameters.frame_parameters.body[k]
    L_H_F = model.kin_dyn_parameters.frame_parameters.transform[k]
    W_H_L = data._link_transforms[parent]
    return W_H_L @ L_H_F


@named_scope
def velocity(
    model, data, *, frame_index: jtp.IntLike, output_vel_repr: VelRepr | None = None
) -> jtp.Vector:
    """6D frame velocity (reference ``frame.py:189-235``)."""
    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )
    k = int(frame_index) - model.number_of_links()
    parent = model.kin_dyn_parameters.frame_parameters.body[k]
    # The frame is rigidly attached: same inertial 6D velocity as the link.
    W_v_WF = data._link_velocities[parent]
    W_H_F = transform(model, data, frame_index=frame_index)
    return inertial_to_other_representation(
        W_v_WF, output_vel_repr, W_H_F, is_force=False
    )


@named_scope
def jacobian(
    model, data, *, frame_index: jtp.IntLike, output_vel_repr: VelRepr | None = None
) -> jtp.Matrix:
    """6×(6+n) frame Jacobian (reference ``frame.py:240-318``)."""
    from . import model as js_model

    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )
    k = int(frame_index) - model.number_of_links()
    parent = model.kin_dyn_parameters.frame_parameters.body[k]

    J_W = js_model.generalized_free_floating_jacobian(
        model, data, output_vel_repr=VelRepr.Inertial
    )[parent]

    W_H_F = transform(model, data, frame_index=frame_index)
    if output_vel_repr is VelRepr.Inertial:
        return J_W
    if output_vel_repr is VelRepr.Body:
        F_X_W = Adjoint.from_transform(W_H_F, inverse=True)
        return F_X_W @ J_W
    if output_vel_repr is VelRepr.Mixed:
        W_H_FW = jnp.eye(4).at[0:3, 3].set(W_H_F[0:3, 3])
        FW_X_W = Adjoint.from_transform(W_H_FW, inverse=True)
        return FW_X_W @ J_W
    raise ValueError(output_vel_repr)


@named_scope
def jacobian_derivative(
    model, data, *, frame_index: jtp.IntLike, output_vel_repr: VelRepr | None = None
) -> jtp.Matrix:
    """6×(6+n) frame Jacobian derivative (reference ``frame.py:320-471``).

    Computed from the parent-link inertial J/J̇ and the (constant offset)
    frame transform: for Inertial output J̇_F = J̇_L; for Body/Mixed the
    chain rule adds the Ẋ term of the output transform.
    """
    from . import model as js_model

    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )
    k = int(frame_index) - model.number_of_links()
    parent = model.kin_dyn_parameters.frame_parameters.body[k]

    J_W = js_model.generalized_free_floating_jacobian(
        model, data, output_vel_repr=VelRepr.Inertial
    )[parent]
    Jd_W = js_model.generalized_free_floating_jacobian_derivative(
        model, data, output_vel_repr=VelRepr.Inertial
    )[parent]

    W_H_F = transform(model, data, frame_index=frame_index)
    W_v_WF = data._link_velocities[parent]

    if output_vel_repr is VelRepr.Inertial:
        return Jd_W
    if output_vel_repr is VelRepr.Body:
        F_X_W = Adjoint.from_transform(W_H_F, inverse=True)
        # d/dt(F_X_W) = -vx(F_v_WF) F_X_W.
        F_v_WF = F_X_W @ W_v_WF
        F_Xd_W = -Cross.vx(F_v_WF) @ F_X_W
        return F_X_W @ Jd_W + F_Xd_W @ J_W
    if output_vel_repr is VelRepr.Mixed:
        p = W_H_F[0:3, 3]
        W_H_FW = jnp.eye(4).at[0:3, 3].set(p)
        FW_X_W = Adjoint.from_transform(W_H_FW, inverse=True)
        # ṗ of the frame origin (mixed linear velocity).
        pd = W_v_WF[0:3] + jnp.cross(W_v_WF[3:6], p)
        # d/dt(FW_X_W): FW_X_W = [[I, -p̂],[0, I]] ⇒ derivative [[0, -ṗ̂],[0,0]].
        from jaxsim_tpu.math import Skew

        FW_Xd_W = jnp.zeros((6, 6)).at[0:3, 3:6].set(-Skew.wedge(pd))
        return FW_X_W @ Jd_W + FW_Xd_W @ J_W
    raise ValueError(output_vel_repr)
