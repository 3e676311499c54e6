"""Actuation model: references + joint limits + friction + torque-speed curve.

Role of reference ``src/jaxsim/api/actuation_model.py:7-126``.
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .common import named_scope


@named_scope
def compute_resultant_torques(
    model,
    data,
    *,
    joint_force_references: jtp.VectorLike | None = None,
) -> jtp.Vector:
    """Total joint torques: references + position-limit spring/damper +
    optional static/viscous friction, clipped to the tn-curve envelope."""
    tau_references = (
        jnp.atleast_1d(jnp.asarray(joint_force_references, dtype=float))
        if joint_force_references is not None
        else jnp.zeros_like(data.joint_positions)
    )

    tau_position_limit = jnp.zeros_like(tau_references)
    if model.dofs() > 0:
        jp = model.kin_dyn_parameters.joint_parameters
        k_j = jp.position_limit_spring
        d_j = jp.position_limit_damper

        lower_violation = jnp.clip(
            data.joint_positions - jp.position_limits_min, max=0.0
        )
        upper_violation = jnp.clip(
            data.joint_positions - jp.position_limits_max, min=0.0
        )
        violation = lower_violation + upper_violation
        # Spring pushes back into the range; damper acts only while violating
        # (the reference's formula multiplies the limit torque by d·ṡ, which
        # is positive feedback for d·ṡ > 1 — we use the standard gated form).
        tau_position_limit = -k_j * violation - (violation != 0.0) * (
            d_j * data.joint_velocities
        )

    tau_friction = jnp.zeros_like(tau_references)
    if model.dofs() > 0 and model.actuation_params.enable_friction:
        jp = model.kin_dyn_parameters.joint_parameters
        tau_friction = -(
            jp.friction_static * jnp.sign(data.joint_velocities)
            + jp.friction_viscous * data.joint_velocities
        )

    tau_total = tau_references + tau_friction + tau_position_limit
    tau_lim = tn_curve_fn(model=model, data=data)
    return jnp.clip(tau_total, -tau_lim, tau_lim)


def tn_curve_fn(model, data) -> jtp.Vector:
    """Torque-speed envelope (reference ``actuation_model.py:101-126``)."""
    tau_max = model.actuation_params.torque_max
    w_th = model.actuation_params.omega_th
    w_max = model.actuation_params.omega_max
    abs_vel = jnp.abs(data.joint_velocities)
    return jnp.where(
        abs_vel <= w_th,
        tau_max,
        jnp.where(
            abs_vel <= w_max,
            tau_max * (1 - (abs_vel - w_th) / (w_max - w_th)),
            0.0,
        ),
    )
