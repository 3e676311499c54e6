"""Link-level API (reference ``src/jaxsim/api/link.py``)."""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu import exceptions
from jaxsim_tpu.math import Adjoint

from .common import VelRepr, inertial_to_other_representation, named_scope


def name_to_idx(model, *, link_name: str) -> int:
    if link_name not in model.link_names():
        raise ValueError(f"Link '{link_name}' not found in the model")
    return model.link_names().index(link_name)


def idx_to_name(model, *, link_index: int) -> str:
    return model.link_names()[int(link_index)]


def names_to_idxs(model, *, link_names) -> jtp.Vector:
    return jnp.array([name_to_idx(model, link_name=n) for n in link_names], dtype=int)


def idxs_to_names(model, *, link_indices) -> tuple[str, ...]:
    return tuple(idx_to_name(model, link_index=i) for i in link_indices)


@named_scope
def mass(model, *, link_index: jtp.IntLike) -> jtp.Float:
    return model.kin_dyn_parameters.link_parameters.mass[link_index]


@named_scope
def spatial_inertia(model, *, link_index: jtp.IntLike) -> jtp.Matrix:
    """6×6 spatial inertia in the link frame."""
    return model.kin_dyn_parameters.link_parameters.spatial_inertia()[link_index]


@named_scope
def transform(model, data, *, link_index: jtp.IntLike) -> jtp.Matrix:
    """World pose of the link (from the FK cache)."""
    return data._link_transforms[link_index]


@named_scope
def com_position(
    model, data, *, link_index: jtp.IntLike, in_link_frame: bool = True
) -> jtp.Vector:
    """CoM position of the link (reference ``api/link.py:179-236``)."""
    L_p_com = model.kin_dyn_parameters.link_parameters.center_of_mass[link_index]
    if in_link_frame:
        return L_p_com
    W_H_L = data._link_transforms[link_index]
    return W_H_L[0:3, 0:3] @ L_p_com + W_H_L[0:3, 3]


@named_scope
def jacobian(
    model, data, *, link_index: jtp.IntLike, output_vel_repr: VelRepr | None = None
) -> jtp.Matrix:
    """6×(6+n) link Jacobian (reference ``api/link.py:238-336``)."""
    from . import model as js_model

    J = js_model.generalized_free_floating_jacobian(
        model, data, output_vel_repr=output_vel_repr
    )
    return J[link_index]


@named_scope
def velocity(
    model, data, *, link_index: jtp.IntLike, output_vel_repr: VelRepr | None = None
) -> jtp.Vector:
    """6D link velocity (reference ``api/link.py:338-386``)."""
    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )
    W_v_WL = data._link_velocities[link_index]
    W_H_L = data._link_transforms[link_index]
    return inertial_to_other_representation(
        W_v_WL, output_vel_repr, W_H_L, is_force=False
    )


@named_scope
def jacobian_derivative(
    model, data, *, link_index: jtp.IntLike, output_vel_repr: VelRepr | None = None
) -> jtp.Matrix:
    """6×(6+n) link Jacobian derivative (reference ``api/link.py:388-431``)."""
    from . import model as js_model

    Jd = js_model.generalized_free_floating_jacobian_derivative(
        model, data, output_vel_repr=output_vel_repr
    )
    return Jd[link_index]


@named_scope
def bias_acceleration(
    model, data, *, link_index: jtp.IntLike, output_vel_repr: VelRepr | None = None
) -> jtp.Vector:
    """J̇ ν of the link (reference ``api/link.py:433-461``)."""
    Jd = jacobian_derivative(
        model, data, link_index=link_index, output_vel_repr=output_vel_repr
    )
    nu = data.generalized_velocity
    return Jd @ nu
