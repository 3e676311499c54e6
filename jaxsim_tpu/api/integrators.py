"""Fixed-step integrators (reference ``src/jaxsim/api/integrators.py``)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Quaternion, safe_norm

from .common import VelRepr, named_scope


def _normalize_quaternion(q: jtp.Vector) -> jtp.Vector:
    norm = safe_norm(q, axis=-1, keepdims=True)
    return q / jnp.where(norm == 0, 1.0, norm)


@named_scope
def semi_implicit_euler_integration(
    model, data, *, link_forces_inertial, joint_torques
):
    """Symplectic Euler: update velocities with accelerations at t0, then
    positions with the NEW velocities (reference ``integrators.py:14-88``)."""
    from . import ode

    dt = model.time_step

    with data.switch_velocity_representation(VelRepr.Inertial) as data_in:
        W_vd_WB, sdd, contact_state_derivative = ode.system_acceleration(
            model=model,
            data=data_in,
            link_forces=link_forces_inertial,
            joint_torques=joint_torques,
        )

    W_v_WB = jnp.concatenate(
        [data.base_linear_velocity_inertial, data.base_angular_velocity_inertial],
        axis=-1,
    )
    W_v_WB_new = W_v_WB + dt * W_vd_WB
    sd_new = data.joint_velocities + dt * sdd

    W_omega_WB = W_v_WB_new[3:6]
    W_pd_B = W_v_WB_new[0:3] + jnp.cross(W_omega_WB, data.base_position)
    W_Qd_B = Quaternion.derivative(
        data.base_orientation, W_omega_WB, omega_in_body_fixed=False
    )

    W_p_B = data.base_position + dt * W_pd_B
    W_Q_B = _normalize_quaternion(data.base_orientation + dt * W_Qd_B)
    s = data.joint_positions + dt * sd_new

    contact_state = model.contact_model.update_contact_state(
        data.contact_state, contact_state_derivative, dt
    )

    return data.replace(
        model=model,
        base_position=W_p_B,
        base_quaternion=W_Q_B,
        joint_positions=s,
        joint_velocities=sd_new,
        base_linear_velocity_inertial=W_v_WB_new[0:3],
        base_angular_velocity_inertial=W_omega_WB,
        contact_state=contact_state,
    )


def _rk4_core(model, data, *, link_forces_inertial, joint_torques, dynamics_fn):
    """Classic RK4 tree-mapped over the state dict."""
    dt = model.time_step

    x_t0 = dict(
        base_position=data.base_position,
        base_quaternion=_normalize_quaternion(data.base_quaternion),
        joint_positions=data.joint_positions,
        base_linear_velocity_inertial=data.base_linear_velocity_inertial,
        base_angular_velocity_inertial=data.base_angular_velocity_inertial,
        joint_velocities=data.joint_velocities,
        contact_state=data.contact_state,
    )

    def f(x):
        data_ti = data.replace(model=model, **x)
        return dynamics_fn(data_ti)

    euler_mid = lambda x, dxdt: x + (0.5 * dt) * dxdt
    euler_fin = lambda x, dxdt: x + dt * dxdt

    k1 = f(x_t0)
    k2 = f(jax.tree.map(euler_mid, x_t0, k1))
    k3 = f(jax.tree.map(euler_mid, x_t0, k2))
    k4 = f(jax.tree.map(euler_fin, x_t0, k3))

    dxdt = jax.tree.map(lambda a, b, c, d: (a + 2 * b + 2 * c + d) / 6, k1, k2, k3, k4)
    x_tf = jax.tree.map(euler_fin, x_t0, dxdt)
    x_tf["base_quaternion"] = _normalize_quaternion(x_tf["base_quaternion"])

    return data.replace(model=model, **x_tf)


@named_scope
def rk4_integration(model, data, *, link_forces_inertial, joint_torques):
    """RK4 over the full dynamics — contacts re-evaluated at all 4 stages
    (reference ``integrators.py:91-156``)."""
    from . import ode

    def dynamics(data_ti):
        return ode.system_dynamics(
            model=model,
            data=data_ti,
            link_forces=_forces_as_inertial_view(data_ti, link_forces_inertial),
            joint_torques=joint_torques,
        )

    return _rk4_core(
        model,
        data,
        link_forces_inertial=link_forces_inertial,
        joint_torques=joint_torques,
        dynamics_fn=dynamics,
    )


def _forces_as_inertial_view(data_ti, W_f_L):
    """system_dynamics expects forces in the data's representation; we carry
    them in inertial, so present them through an Inertial-repr view."""
    # system_dynamics internally switches to Inertial before using forces, so
    # forces expressed in Inertial pass through unchanged.
    return W_f_L


@named_scope
def rk4fast_integration(model, data, *, link_forces_inertial, joint_torques):
    """RK4 with contact forces frozen at t0 (reference
    ``integrators.py:159-263``) — 1 contact evaluation instead of 4."""
    from . import contact as js_contact
    from . import model as js_model
    from . import ode

    W_f_L_total = link_forces_inertial
    contact_state_derivative = {}
    if len(model.kin_dyn_parameters.contact_parameters.body) > 0:
        W_f_L_terrain, contact_state_derivative = js_contact.link_contact_forces(
            model=model,
            data=data,
            link_forces=link_forces_inertial,
            joint_torques=joint_torques,
        )
        W_f_L_total = link_forces_inertial + W_f_L_terrain

    def dynamics(data_ti):
        with data_ti.switch_velocity_representation(VelRepr.Inertial) as d_in:
            W_vd_WB, sdd = js_model.forward_dynamics_aba(
                model=model,
                data=d_in,
                joint_forces=joint_torques,
                link_forces=W_f_L_total,
            )
            W_pd_B, W_Qd_B, sd = ode.system_position_dynamics(data=d_in)
        return dict(
            base_position=W_pd_B,
            base_quaternion=W_Qd_B,
            joint_positions=sd,
            base_linear_velocity_inertial=W_vd_WB[0:3],
            base_angular_velocity_inertial=W_vd_WB[3:6],
            joint_velocities=sdd,
            contact_state=jax.tree.map(jnp.zeros_like, data_ti.contact_state),
        )

    data_tf = _rk4_core(
        model,
        data,
        link_forces_inertial=W_f_L_total,
        joint_torques=joint_torques,
        dynamics_fn=dynamics,
    )

    # Integrate the contact state with the t0 derivative.
    contact_state = model.contact_model.update_contact_state(
        data.contact_state, contact_state_derivative, model.time_step
    )
    return dataclasses.replace(data_tf, contact_state=contact_state)


from .model import IntegratorType  # noqa: E402

_INTEGRATORS_MAP = {
    IntegratorType.SemiImplicitEuler: semi_implicit_euler_integration,
    IntegratorType.RungeKutta4: rk4_integration,
    IntegratorType.RungeKutta4Fast: rk4fast_integration,
}
