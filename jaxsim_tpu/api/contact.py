"""Contact point API (reference ``src/jaxsim/api/contact.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu import ops
from jaxsim_tpu.math import Adjoint, Transform

from .common import VelRepr, named_scope


@named_scope
def collidable_point_kinematics(model, data) -> tuple[jtp.Matrix, jtp.Matrix]:
    """Positions and mixed linear velocities of enabled collidable points
    (reference ``contact.py:18-87``) — reads the data caches."""
    return ops.collidable_points_pos_vel(
        model.kin_dyn_parameters,
        link_transforms=data._link_transforms,
        link_velocities_inertial=data._link_velocities,
    )


@named_scope
def collidable_point_positions(model, data) -> jtp.Matrix:
    return collidable_point_kinematics(model, data)[0]


@named_scope
def collidable_point_velocities(model, data) -> jtp.Matrix:
    return collidable_point_kinematics(model, data)[1]


@named_scope
def in_contact(model, data) -> jtp.Vector:
    """Boolean per enabled point: below terrain height
    (reference ``contact.py:90-145``)."""
    W_p_C, _ = collidable_point_kinematics(model, data)
    terrain_height = model.terrain.height(W_p_C[:, 0], W_p_C[:, 1])
    return W_p_C[:, 2] <= terrain_height


def estimate_good_soft_contacts_parameters(model, **kwargs):
    """Deprecated alias of :func:`estimate_good_contact_parameters`."""
    return estimate_good_contact_parameters(model, **kwargs)


def estimate_good_contact_parameters(model, **kwargs):
    """Default contact parameters from the model mass
    (reference ``contact.py:160-211``)."""
    return model.contact_model._parameters_class.build_default_from_jaxsim_model(
        model, **kwargs
    )


@named_scope
def transforms(model, data) -> jtp.Array:
    """``(nC, 4, 4)`` world transforms of the implicit frames C = (W_p_C, [L])
    of the enabled points (reference ``contact.py:214-255``)."""
    idx = model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points
    parents = jnp.array(
        [model.kin_dyn_parameters.contact_parameters.body[i] for i in idx], dtype=int
    )
    L_p_C = model.kin_dyn_parameters.contact_parameters.point[
        jnp.array(idx, dtype=int)
    ]
    W_H_L = data._link_transforms[parents]
    W_p_C = (
        jnp.einsum("cij,cj->ci", W_H_L[:, 0:3, 0:3], L_p_C) + W_H_L[:, 0:3, 3]
    )
    return W_H_L.at[:, 0:3, 3].set(W_p_C)


@named_scope
def jacobian(model, data, *, output_vel_repr: VelRepr | None = None) -> jtp.Array:
    """``(nC, 6, 6+n)`` Jacobians of the collidable points
    (reference ``contact.py:258-389``)."""
    from . import model as js_model

    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )

    idx = model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points
    parents = jnp.array(
        [model.kin_dyn_parameters.contact_parameters.body[i] for i in idx], dtype=int
    )

    # Link Jacobians with inertial output, then shift to the point frames.
    J_L = js_model.generalized_free_floating_jacobian(
        model, data, output_vel_repr=VelRepr.Inertial
    )  # (nL, 6, 6+n)
    J_parent = J_L[parents]  # (nC, 6, 6+n)

    W_H_C = transforms(model, data)

    if output_vel_repr is VelRepr.Inertial:
        return J_parent
    if output_vel_repr is VelRepr.Body:
        C_X_W = Adjoint.from_transform(W_H_C, inverse=True)
        return jnp.einsum("cij,cjk->cik", C_X_W, J_parent)
    if output_vel_repr is VelRepr.Mixed:
        # CW frame: origin W_p_C, orientation of W ⇒ W_H_CW = trans(W_p_C).
        W_H_CW = jnp.broadcast_to(jnp.eye(4), W_H_C.shape).at[:, 0:3, 3].set(
            W_H_C[:, 0:3, 3]
        )
        CW_X_W = Adjoint.from_transform(W_H_CW, inverse=True)
        return jnp.einsum("cij,cjk->cik", CW_X_W, J_parent)
    raise ValueError(output_vel_repr)


@named_scope
def link_contact_forces(
    model,
    data,
    *,
    link_forces: jtp.MatrixLike | None = None,
    joint_torques: jtp.VectorLike | None = None,
) -> tuple[jtp.Matrix, dict]:
    """``(nL, 6)`` inertial contact forces aggregated per link
    (reference ``contact.py:514-554``)."""
    from jaxsim_tpu.ops.contacts.soft import SoftContacts

    kwargs = (
        {}
        if isinstance(model.contact_model, SoftContacts)
        else dict(link_forces=link_forces, joint_torques=joint_torques)
    )
    W_f_C, aux_dict = model.contact_model.compute_contact_forces(model, data, **kwargs)
    W_f_L = link_forces_from_contact_forces(model, contact_forces=W_f_C)
    return W_f_L, aux_dict


def link_forces_from_contact_forces(model, *, contact_forces) -> jtp.Matrix:
    """Scatter-add point forces onto their parent links via a boolean mask
    matmul (reference ``contact.py:557-603``)."""
    cp = model.kin_dyn_parameters.contact_parameters
    idx = cp.indices_of_enabled_collidable_points
    W_f_C = jnp.asarray(contact_forces, dtype=float)
    parents = jnp.array(cp.body, dtype=int)[jnp.array(idx, dtype=int)]
    mask = parents[:, None] == jnp.arange(model.number_of_links())
    return jnp.einsum("cl,ci->li", mask.astype(W_f_C.dtype), W_f_C)


@named_scope
def jacobian_derivative(
    model, data, *, output_vel_repr: VelRepr | None = None
) -> jtp.Array:
    """``(nC, 6, 6+n)`` Jacobian derivatives of the collidable points
    (reference ``contact.py:391-511``)."""
    from jaxsim_tpu.math import Skew

    from . import model as js_model

    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )

    idx = model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points
    parents = jnp.array(
        [model.kin_dyn_parameters.contact_parameters.body[i] for i in idx], dtype=int
    )

    J_W = js_model.generalized_free_floating_jacobian(
        model, data, output_vel_repr=VelRepr.Inertial
    )[parents]
    Jd_W = js_model.generalized_free_floating_jacobian_derivative(
        model, data, output_vel_repr=VelRepr.Inertial
    )[parents]

    if output_vel_repr is VelRepr.Inertial:
        return Jd_W

    W_p_C, W_pd_C = collidable_point_kinematics(model, data)
    nC = W_p_C.shape[0]

    if output_vel_repr is VelRepr.Mixed:
        # CW frame: origin W_p_C, orientation W. CW_X_W = [[I, -p̂],[0, I]];
        # its derivative is [[0, -ṗ̂],[0, 0]].
        CW_X_W = (
            jnp.broadcast_to(jnp.eye(6), (nC, 6, 6))
            .at[:, 0:3, 3:6]
            .set(-Skew.wedge(W_p_C))
        )
        CWd_X_W = jnp.zeros((nC, 6, 6)).at[:, 0:3, 3:6].set(-Skew.wedge(W_pd_C))
        return jnp.einsum("cij,cjk->cik", CW_X_W, Jd_W) + jnp.einsum(
            "cij,cjk->cik", CWd_X_W, J_W
        )

    if output_vel_repr is VelRepr.Body:
        from jaxsim_tpu.math import Adjoint, Cross

        W_H_C = transforms(model, data)
        C_X_W = Adjoint.from_transform(W_H_C, inverse=True)
        # The C frame is rigidly attached to the parent link: same inertial
        # 6D velocity as the link.
        W_v_WC = data._link_velocities[parents]
        C_v_WC = jnp.einsum("cij,cj->ci", C_X_W, W_v_WC)
        C_Xd_W = -jnp.einsum("cij,cjk->cik", Cross.vx(C_v_WC), C_X_W)
        return jnp.einsum("cij,cjk->cik", C_X_W, Jd_W) + jnp.einsum(
            "cij,cjk->cik", C_Xd_W, J_W
        )
    raise ValueError(output_vel_repr)
