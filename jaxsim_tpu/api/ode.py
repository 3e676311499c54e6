"""System dynamics: accelerations and position derivatives.

Role of reference ``src/jaxsim/api/ode.py:16-225``.
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Quaternion, Skew

from .common import VelRepr, named_scope


@named_scope
def system_acceleration(
    model,
    data,
    *,
    link_forces: jtp.MatrixLike | None = None,
    joint_torques: jtp.VectorLike | None = None,
) -> tuple[jtp.Vector, jtp.Vector, dict[str, jtp.PyTree]]:
    """Base + joint accelerations in the active representation, plus the
    contact-state derivative (reference ``ode.py:16-131``).

    ``link_forces`` must be expressed in the data's active representation.
    """
    from . import contact as js_contact
    from . import model as js_model

    f_L = (
        jnp.asarray(link_forces, dtype=float)
        if link_forces is not None
        else jnp.zeros((model.number_of_links(), 6))
    )

    # Convert user forces to inertial (contacts produce inertial forces).
    W_f_L = js_model.other_representation_to_inertial_links(model, data, f_L)

    contact_state_derivative = {}
    W_f_L_total = W_f_L

    if len(model.kin_dyn_parameters.contact_parameters.body) > 0:
        W_f_L_terrain, contact_state_derivative = js_contact.link_contact_forces(
            model=model,
            data=data,
            link_forces=W_f_L,
            joint_torques=joint_torques,
        )
        W_f_L_total = W_f_L + W_f_L_terrain

    # Kinematic-constraint wrenches (weld constraints).
    if len(model.kin_dyn_parameters.constraints) > 0:
        from jaxsim_tpu.ops.kinematic_constraints import compute_constraint_wrenches

        W_f_constraints, parent_indices = compute_constraint_wrenches(
            model=model,
            data=data,
            link_forces_inertial=W_f_L_total,
            joint_force_references=joint_torques,
        )
        W_f_L_total = W_f_L_total.at[parent_indices].add(W_f_constraints)

    # ABA with inertial forces: pass them through a data view in Inertial
    # representation so no further conversion happens.
    with data.switch_velocity_representation(VelRepr.Inertial) as data_inertial:
        W_vd_WB, sdd = js_model.forward_dynamics_aba(
            model=model,
            data=data_inertial,
            joint_forces=joint_torques,
            link_forces=W_f_L_total,
        )

    # Convert the inertial acceleration to the data's representation.
    vd_out = js_model._inertial_acceleration_to_other(model, data, W_vd_WB)
    return vd_out, sdd, contact_state_derivative


@named_scope
def system_position_dynamics(
    data, baumgarte_quaternion_regularization: jtp.FloatLike = 1.0
) -> tuple[jtp.Vector, jtp.Vector, jtp.Vector]:
    """(Ẇ_p_B, Ẇ_Q_B, ṡ) from inertial-fixed velocities
    (reference ``ode.py:136-171``)."""
    sd = data.joint_velocities
    W_Q_B = data.base_orientation
    W_omega_WB = data.base_angular_velocity_inertial
    W_pd_B = data.base_linear_velocity_inertial + jnp.cross(
        W_omega_WB, data.base_position
    )
    W_Qd_B = Quaternion.derivative(
        W_Q_B,
        W_omega_WB,
        omega_in_body_fixed=False,
        K=baumgarte_quaternion_regularization,
    )
    return W_pd_B, W_Qd_B, sd


@named_scope
def system_dynamics(
    model,
    data,
    *,
    link_forces: jtp.VectorLike | None = None,
    joint_torques: jtp.VectorLike | None = None,
    baumgarte_quaternion_regularization: jtp.FloatLike = 1.0,
) -> dict[str, jtp.PyTree]:
    """Full state derivative as a dict (reference ``ode.py:174-225``)."""
    with data.switch_velocity_representation(VelRepr.Inertial) as data_inertial:
        W_vd_WB, sdd, contact_state_derivative = system_acceleration(
            model=model,
            data=data_inertial,
            link_forces=link_forces,
            joint_torques=joint_torques,
        )
    W_pd_B, W_Qd_B, sd = system_position_dynamics(
        data=data,
        baumgarte_quaternion_regularization=baumgarte_quaternion_regularization,
    )

    return dict(
        base_position=W_pd_B,
        base_quaternion=W_Qd_B,
        joint_positions=sd,
        base_linear_velocity_inertial=W_vd_WB[0:3],
        base_angular_velocity_inertial=W_vd_WB[3:6],
        joint_velocities=sdd,
        contact_state=model.contact_model.contact_state_derivative(
            contact_state_derivative
        )
        if contact_state_derivative
        else {},
    )
