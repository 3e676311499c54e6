"""Center-of-mass / centroidal API (reference ``src/jaxsim/api/com.py``)."""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint, Cross

from .common import VelRepr, named_scope


@named_scope
def com_position(model, data) -> jtp.Vector:
    """World CoM position: mass-weighted link CoMs
    (reference ``com.py:13-45``)."""
    m = model.kin_dyn_parameters.link_parameters.mass
    L_p_com = model.kin_dyn_parameters.link_parameters.center_of_mass
    W_H_L = data._link_transforms
    W_p_com = (
        jnp.einsum("lij,lj->li", W_H_L[:, 0:3, 0:3], L_p_com) + W_H_L[:, 0:3, 3]
    )
    return jnp.einsum("l,li->i", m, W_p_com) / jnp.sum(m)


@named_scope
def com_linear_velocity(model, data) -> jtp.Vector:
    """CoM linear velocity (mixed): h_lin / m (reference ``com.py:50-76``)."""
    from . import model as js_model

    # Total momentum in mixed G[W]-like coords: use average velocity of the
    # locked system expressed with centroidal transform.
    h_G = centroidal_momentum(model, data)
    m = js_model.total_mass(model)
    return h_G[0:3] / m


def _centroidal_transform(model, data) -> jtp.Matrix:
    """W_H_G: origin at CoM, orientation of W."""
    W_p_com = com_position(model, data)
    return jnp.eye(4).at[0:3, 3].set(W_p_com)


@named_scope
def centroidal_momentum(model, data) -> jtp.Vector:
    """6D momentum about the CoM in the G[W] frame
    (reference ``com.py:81-115``)."""
    from . import model as js_model
    from .common import inertial_to_other_representation

    # Momentum in inertial coordinates.
    with data.switch_velocity_representation(VelRepr.Inertial) as d:
        h_W = js_model.total_momentum(model, d)

    # Transport to G: h_G = G_Xf_W h_W with G = (p_com, R=I).
    W_H_G = _centroidal_transform(model, data)
    G_Xf_W = jnp.swapaxes(Adjoint.from_transform(W_H_G), -1, -2)
    return G_Xf_W @ h_W


@named_scope
def centroidal_momentum_jacobian(model, data) -> jtp.Matrix:
    """J such that J ν = centroidal momentum (reference ``com.py:118-156``)."""
    from . import model as js_model

    with data.switch_velocity_representation(VelRepr.Inertial) as d:
        M = js_model.free_floating_mass_matrix(model, d)
        J_mom_W = M[0:6, :]
        # Input conversion back to the data's representation.
        T = js_model._input_repr_transform(model, data, data.velocity_representation)
        # ν_inertial = diag(W-something) ... momentum rows expect inertial ν:
        # ν_W = diag(W_X_B B_X_repr?, I) — combine: columns transform.
        # J ν_data: base block maps data-repr base velocity to inertial.
        B_X_W = js_model._input_repr_transform(model, data, VelRepr.Inertial)
        W_X_B = Adjoint.inverse(B_X_W)
        J_mom = J_mom_W.at[:, 0:6].set(J_mom_W[:, 0:6] @ W_X_B @ T)

    W_H_G = _centroidal_transform(model, data)
    G_Xf_W = jnp.swapaxes(Adjoint.from_transform(W_H_G), -1, -2)
    return G_Xf_W @ J_mom


@named_scope
def locked_centroidal_spatial_inertia(model, data):
    """Locked 6D inertia at the centroidal frame
    (reference ``com.py:158-193``)."""
    from . import model as js_model

    with data.switch_velocity_representation(VelRepr.Body) as d:
        B_I = js_model.locked_spatial_inertia(model, d)

    W_H_B = data._base_transform
    W_H_G = _centroidal_transform(model, data)
    from jaxsim_tpu.math import Transform

    G_H_B = Transform.inverse(W_H_G) @ W_H_B
    G_X_B = Adjoint.from_transform(G_H_B)
    B_X_G = Adjoint.inverse(G_X_B)
    return B_X_G.T @ B_I @ B_X_G


@named_scope
def average_centroidal_velocity(model, data) -> jtp.Vector:
    """I_G⁻¹ h_G (reference ``com.py:196-221``)."""
    h_G = centroidal_momentum(model, data)
    I_G = locked_centroidal_spatial_inertia(model, data)
    return jnp.linalg.solve(I_G, h_G)


@named_scope
def average_centroidal_velocity_jacobian(model, data) -> jtp.Matrix:
    """I_G⁻¹ J_h,G (reference ``com.py:224-249``)."""
    J_hG = centroidal_momentum_jacobian(model, data)
    I_G = locked_centroidal_spatial_inertia(model, data)
    return jnp.linalg.solve(I_G, J_hG)


@named_scope
def bias_acceleration(model, data) -> jtp.Vector:
    """Bias linear acceleration of the CoM (mixed)
    (reference ``com.py:251-421``): mass-weighted link mixed bias
    accelerations evaluated at link CoMs."""
    from . import model as js_model

    m = model.kin_dyn_parameters.link_parameters.mass
    total_m = jnp.sum(m)

    # Mixed-representation J̇ν of each link, shifted to the link CoM.
    with data.switch_velocity_representation(VelRepr.Mixed) as d:
        Jd = js_model.generalized_free_floating_jacobian_derivative(
            model, d, output_vel_repr=VelRepr.Mixed
        )
        nu = d.generalized_velocity
    a_bias_links = jnp.einsum("lij,j->li", Jd, nu)  # (nL, 6) mixed

    # Linear part at the link origin → at the CoM: a_com = a_lin + α × (R c).
    W_H_L = data._link_transforms
    c_W = jnp.einsum(
        "lij,lj->li",
        W_H_L[:, 0:3, 0:3],
        model.kin_dyn_parameters.link_parameters.center_of_mass,
    )
    # Mixed velocities for the ω × (ω × c) term.
    v_mixed = data._link_velocities  # inertial
    from .common import inertial_to_other_representation

    v_mix = inertial_to_other_representation(
        v_mixed, VelRepr.Mixed, W_H_L, is_force=False
    )
    omega = v_mix[:, 3:6]
    alpha = a_bias_links[:, 3:6]
    a_com = (
        a_bias_links[:, 0:3]
        + jnp.cross(alpha, c_W)
        + jnp.cross(omega, jnp.cross(omega, c_W))
    )
    return jnp.einsum("l,li->i", m, a_com) / total_m
