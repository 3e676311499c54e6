"""The model object and its functional API.

Role of reference ``src/jaxsim/api/model.py`` (2.7 kLoC): ``JaxSimModel``
(time-invariant parameters + static configuration) and free functions
``js.model.*`` operating on (model, data) pairs. Everything traced is
batched-friendly; static fields key the JIT cache.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
import pathlib
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.typing as jtp
from jaxsim_tpu import exceptions, logging, ops
from jaxsim_tpu.math import STANDARD_GRAVITY, Adjoint, Cross, Transform
from jaxsim_tpu.ops.contacts.common import ContactModel, ContactsParams
from jaxsim_tpu.ops.contacts.soft import SoftContacts, SoftContactsParams
from jaxsim_tpu.parsers import build_model_description
from jaxsim_tpu.parsers.descriptions import ModelDescription
from jaxsim_tpu.terrain import FlatTerrain, Terrain
from jaxsim_tpu.utils import HashlessObject, pytree_dataclass, static_field

from .common import (
    VelRepr,
    inertial_to_other_representation,
    named_scope,
    other_representation_to_inertial,
)
from .kin_dyn_parameters import ConstraintMap, KinDynParameters


class IntegratorType(enum.IntEnum):
    """Fixed-step integrators (reference ``api/integrators.py``)."""

    SemiImplicitEuler = enum.auto()
    RungeKutta4 = enum.auto()
    RungeKutta4Fast = enum.auto()


@pytree_dataclass
class JaxSimModel:
    """Time-invariant model: parameters + simulation configuration.

    Dynamic leaves: ``time_step``, ``kin_dyn_parameters`` (differentiable),
    ``contact_params``. Everything else is static and participates in the JIT
    cache key (reference ``api/model.py:46-122``).
    """

    model_name: str = static_field(default="model")
    terrain: Terrain = static_field(default_factory=FlatTerrain.build)
    contact_model: ContactModel = static_field(default_factory=SoftContacts)
    integrator: IntegratorType = static_field(
        default=IntegratorType.SemiImplicitEuler
    )
    gravity: float = static_field(default=-STANDARD_GRAVITY)
    # Step backend: "auto" routes js.model.step through the BatchedEngine
    # fast path whenever the configuration is inside its envelope (falls
    # back to the generic path with a one-time warning otherwise);
    # "generic" always uses the reference-style path; "engine" requires
    # the fast path and raises if the model is outside its envelope.
    backend: str = static_field(default="auto")

    time_step: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(1e-3, dtype=float)
    )
    kin_dyn_parameters: KinDynParameters | None = None
    contact_params: ContactsParams | None = None
    actuation_params: "ActuationParams | None" = None

    _description: HashlessObject = static_field(default=None)
    built_from: HashlessObject = static_field(default=None)
    _fixed_base: bool = static_field(default=False)

    # ----- construction -----

    @staticmethod
    def build_from_model_description(
        model_description: str | pathlib.Path,
        *,
        model_name: str | None = None,
        time_step: jtp.FloatLike | None = None,
        terrain: Terrain | None = None,
        contact_model: ContactModel | None = None,
        contact_params: ContactsParams | None = None,
        actuation_params: "ActuationParams | None" = None,
        integrator: IntegratorType | None = None,
        is_urdf: bool | None = None,
        considered_joints: Sequence[str] | None = None,
        constraints: ConstraintMap | None = None,
        gravity: jtp.FloatLike = STANDARD_GRAVITY,
        backend: str = "auto",
    ) -> "JaxSimModel":
        """Parse a URDF/SDF resource and build a model
        (reference ``api/model.py:128-223``)."""
        intermediate_description = build_model_description(
            model_description, is_urdf=is_urdf
        )

        if considered_joints is not None:
            intermediate_description = intermediate_description.reduce(
                considered_joints=considered_joints
            )

        model = JaxSimModel.build(
            model_description=intermediate_description,
            model_name=model_name,
            time_step=time_step,
            terrain=terrain,
            contact_model=contact_model,
            contact_params=contact_params,
            actuation_params=actuation_params,
            integrator=integrator,
            constraints=constraints,
            gravity=gravity,
            backend=backend,
        )
        object.__setattr__(model, "built_from", HashlessObject(model_description))
        return model

    @staticmethod
    def build(
        model_description: ModelDescription,
        *,
        model_name: str | None = None,
        time_step: jtp.FloatLike | None = None,
        terrain: Terrain | None = None,
        contact_model: ContactModel | None = None,
        contact_params: ContactsParams | None = None,
        actuation_params: "ActuationParams | None" = None,
        integrator: IntegratorType | None = None,
        constraints: ConstraintMap | None = None,
        gravity: jtp.FloatLike = STANDARD_GRAVITY,
        backend: str = "auto",
    ) -> "JaxSimModel":
        """Build from an in-memory description
        (reference ``api/model.py:225-330``)."""
        if backend not in ("auto", "generic", "engine"):
            raise ValueError(f"unknown backend {backend!r}")
        from jaxsim_tpu.ops.actuation import ActuationParams

        model_name = model_name if model_name is not None else model_description.name
        terrain = terrain if terrain is not None else FlatTerrain.build()
        contact_model = contact_model if contact_model is not None else SoftContacts()
        integrator = (
            integrator if integrator is not None else IntegratorType.SemiImplicitEuler
        )
        time_step = jnp.asarray(
            time_step if time_step is not None else 1e-3, dtype=float
        )
        actuation_params = (
            actuation_params if actuation_params is not None else ActuationParams()
        )

        kin_dyn_parameters = KinDynParameters.build(
            model_description=model_description, constraints=constraints
        )

        model = JaxSimModel(
            model_name=model_name,
            terrain=terrain,
            contact_model=contact_model,
            integrator=integrator,
            gravity=-float(gravity),
            backend=backend,
            time_step=time_step,
            kin_dyn_parameters=kin_dyn_parameters,
            contact_params=contact_params,
            actuation_params=actuation_params,
            _description=HashlessObject(model_description),
            _fixed_base=bool(model_description.fixed_base),
        )

        if contact_params is None:
            params = model.contact_model._parameters_class.build_default_from_jaxsim_model(
                model
            )
            object.__setattr__(model, "contact_params", params)

        return model

    # ----- static info -----

    @property
    def description(self) -> ModelDescription:
        return self._description.get()

    def name(self) -> str:
        return self.model_name

    def number_of_links(self) -> int:
        return self.kin_dyn_parameters.number_of_links()

    def number_of_joints(self) -> int:
        return self.kin_dyn_parameters.number_of_joints()

    def number_of_frames(self) -> int:
        return self.kin_dyn_parameters.number_of_frames()

    def dofs(self) -> int:
        return self.number_of_joints()

    def floating_base(self) -> bool:
        return not self._fixed_base

    def fixed_base(self) -> bool:
        return self._fixed_base

    def link_names(self) -> tuple[str, ...]:
        return self.kin_dyn_parameters.link_names

    def joint_names(self) -> tuple[str, ...]:
        return self.kin_dyn_parameters.joint_model.joint_names[1:]

    def frame_names(self) -> tuple[str, ...]:
        return self.kin_dyn_parameters.frame_parameters.name

    def base_link(self) -> str:
        """Name of the base link (index 0)."""
        return self.link_names()[0]

    @property
    def gravity_vector(self) -> jtp.Vector:
        """3D gravity vector (0, 0, model.gravity)."""
        return jnp.array([0.0, 0.0, self.gravity])

    def __hash__(self) -> int:
        return hash(
            (
                self.model_name,
                self.integrator,
                self.contact_model,
                self.terrain,
                self._fixed_base,
                self.backend,
                self.gravity,
                hash(self.kin_dyn_parameters),
            )
        )

    def __eq__(self, other: object) -> bool:
        return isinstance(other, JaxSimModel) and hash(self) == hash(other)


# =====================
# Model transformations
# =====================


@named_scope
def reduce(
    model: JaxSimModel,
    considered_joints: tuple[str, ...],
    locked_joint_positions: dict[str, jtp.FloatLike] | None = None,
) -> JaxSimModel:
    """Reduce a model by locking the non-considered joints at the given
    positions (reference ``api/model.py:807-878``)."""
    locked_joint_positions = locked_joint_positions or {}

    if extra := set(locked_joint_positions) - set(model.joint_names()):
        raise ValueError(f"Locked joints not in the model: {extra}")

    full_description = model.description
    # Inject the locked positions as the joints' initial positions so the
    # reduction lumps links at the right configuration.
    for joint in full_description.joints:
        if joint.name in locked_joint_positions:
            joint.initial_position = float(locked_joint_positions[joint.name])

    reduced_description = full_description.reduce(
        considered_joints=list(considered_joints)
    )

    return JaxSimModel.build(
        model_description=reduced_description,
        model_name=model.model_name,
        time_step=model.time_step,
        terrain=model.terrain,
        contact_model=model.contact_model,
        contact_params=model.contact_params,
        actuation_params=model.actuation_params,
        integrator=model.integrator,
        gravity=-model.gravity,
        backend=model.backend,
    )


# ==================
# Inertial utilities
# ==================


def total_mass(model: JaxSimModel) -> jtp.Float:
    return jnp.sum(model.kin_dyn_parameters.link_parameters.mass)


def link_spatial_inertia_matrices(model: JaxSimModel) -> jtp.Array:
    """``(nL, 6, 6)`` spatial inertias in link frames."""
    return model.kin_dyn_parameters.link_parameters.spatial_inertia()


# ===================
# Kinematics wrappers
# ===================


@named_scope
def forward_kinematics(model: JaxSimModel, data) -> jtp.Array:
    """``(nL, 4, 4)`` world poses of all links (cached in data)."""
    return data._link_transforms


def _base_link_transform(data) -> jtp.Matrix:
    """World pose of the base LINK frame (includes the root-pose offset
    suc_H_i[0], unlike the raw state transform ``data._base_transform``).
    This is the frame the doubly-left Jacobians and stored velocities refer
    to."""
    return data._link_transforms[0]


def _input_repr_transform(model: JaxSimModel, data, repr_: VelRepr) -> jtp.Matrix:
    """T such that ν_body = blockdiag(T, I_n) @ ν_repr (base block only)."""
    W_H_B = _base_link_transform(data)
    if repr_ is VelRepr.Body:
        return jnp.eye(6)
    if repr_ is VelRepr.Inertial:
        return Adjoint.from_transform(W_H_B, inverse=True)  # B_X_W
    if repr_ is VelRepr.Mixed:
        # B_X_BW = B_X_W · W_X_BW (BW: origin p_B, orientation of W).
        W_H_BW = W_H_B.at[..., 0:3, 0:3].set(jnp.eye(3))
        return Adjoint.from_transform(W_H_B, inverse=True) @ Adjoint.from_transform(
            W_H_BW
        )
    raise ValueError(repr_)


@named_scope
def generalized_free_floating_jacobian(
    model: JaxSimModel,
    data,
    *,
    output_vel_repr: VelRepr | None = None,
) -> jtp.Array:
    r"""``(nL, 6, 6+n)`` link Jacobians: input base-velocity block in the
    data's representation, output 6D velocity in ``output_vel_repr``
    (reference ``api/model.py:925-1045``)."""
    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )

    B_J_full, B_H_L = ops.jacobian_full_doubly_left(
        model.kin_dyn_parameters, joint_positions=data.joint_positions
    )

    # Input conversion: right-multiply the base columns.
    T = _input_repr_transform(model, data, data.velocity_representation)
    J = B_J_full.at[:, 0:6].set(B_J_full[:, 0:6] @ T)

    # κb column masking per link.
    kb = model.kin_dyn_parameters.support_body_array_bool
    n = model.number_of_joints()
    base_mask = jnp.ones((model.number_of_links(), 6), dtype=bool)
    mask = jnp.concatenate([base_mask, kb[:, 1 : 1 + n]], axis=1)
    J_links = jnp.where(mask[:, None, :], J[None, :, :], 0.0)  # (nL, 6, 6+n)

    # Output conversion: left-multiply by O_X_B per link.
    W_H_B = _base_link_transform(data)
    if output_vel_repr is VelRepr.Body:
        O_X_B = Adjoint.from_transform(B_H_L, inverse=True)  # L_X_B
    elif output_vel_repr is VelRepr.Inertial:
        O_X_B = Adjoint.from_transform(W_H_B)[None]  # W_X_B
    elif output_vel_repr is VelRepr.Mixed:
        W_H_L = jnp.einsum("ij,ljk->lik", W_H_B, B_H_L)
        LW_H_L = W_H_L.at[..., 0:3, 3].set(jnp.zeros(3))
        LW_H_B = LW_H_L @ Adjoint.to_transform(
            Adjoint.from_transform(B_H_L, inverse=True)
        )
        O_X_B = Adjoint.from_transform(LW_H_B)
    else:
        raise ValueError(output_vel_repr)

    return jnp.einsum("lij,ljk->lik", jnp.broadcast_to(O_X_B, (model.number_of_links(), 6, 6)), J_links)


# =================
# Dynamics wrappers
# =================


def _base_velocity_inertial(data) -> jtp.Vector:
    return jnp.concatenate(
        [data.base_linear_velocity_inertial, data.base_angular_velocity_inertial],
        axis=-1,
    )


@named_scope
def forward_dynamics_aba(
    model: JaxSimModel,
    data,
    *,
    joint_forces: jtp.VectorLike | None = None,
    link_forces: jtp.MatrixLike | None = None,
) -> tuple[jtp.Vector, jtp.Vector]:
    """ABA forward dynamics; ``link_forces`` are in the data's representation
    (reference ``api/model.py:1269-1424``). Returns the base acceleration in
    the data's representation and joint accelerations."""
    W_f_L = (
        other_representation_to_inertial_links(model, data, link_forces)
        if link_forces is not None
        else None
    )

    W_a_WB, sdd = ops.aba(
        model.kin_dyn_parameters,
        base_transform=data._base_transform,
        joint_positions=data.joint_positions,
        base_velocity_inertial=_base_velocity_inertial(data),
        joint_velocities=data.joint_velocities,
        joint_forces=joint_forces,
        link_forces_inertial=W_f_L,
        gravity=model.gravity_vector,
        floating_base=model.floating_base(),
    )

    # Convert the inertial base acceleration to the data's representation.
    a_out = _inertial_acceleration_to_other(model, data, W_a_WB)
    return a_out, sdd


def _inertial_acceleration_to_other(model, data, W_a_WB):
    """Proper conversion of a base *acceleration* between representations
    (the extra ω×v terms appear for Mixed)."""
    repr_ = data.velocity_representation
    W_H_B = _base_link_transform(data)
    W_v_WB = _base_velocity_inertial(data)

    if repr_ is VelRepr.Inertial:
        return W_a_WB
    if repr_ is VelRepr.Body:
        B_X_W = Adjoint.from_transform(W_H_B, inverse=True)
        # B_a = B_X_W (W_a - Ẇ_X_B B_v...) — for left-trivialized derivative:
        # B_v̇ = d/dt(B_X_W W_v) = B_X_W W_v̇ + B_Ẋ_W W_v, B_Ẋ_W = -vx(B_v) B_X_W
        B_v_WB = ops.mv(B_X_W, W_v_WB)
        return ops.mv(B_X_W, W_a_WB) - ops.mv(Cross.vx(B_v_WB), ops.mv(B_X_W, W_v_WB))
    if repr_ is VelRepr.Mixed:
        # BW frame: origin p_B, world orientation. BW_v = [ṗ_B; ω].
        # BW_a = d/dt([ṗ; ω]) = [p̈; ω̇]: from W quantities:
        # ṗ = W_v_lin + ω × p ; p̈ = W_a_lin + ω̇ × p + ω × ṗ.
        p = W_H_B[..., 0:3, 3]
        w = W_v_WB[..., 3:6]
        wd = W_a_WB[..., 3:6]
        pd = W_v_WB[..., 0:3] + jnp.cross(w, p)
        pdd = W_a_WB[..., 0:3] + jnp.cross(wd, p) + jnp.cross(w, pd)
        return jnp.concatenate([pdd, wd], axis=-1)
    raise ValueError(repr_)


def _other_acceleration_to_inertial(model, data, O_a_WB):
    """Inverse of :func:`_inertial_acceleration_to_other`."""
    repr_ = data.velocity_representation
    W_H_B = _base_link_transform(data)
    W_v_WB = _base_velocity_inertial(data)

    if repr_ is VelRepr.Inertial:
        return O_a_WB
    if repr_ is VelRepr.Body:
        W_X_B = Adjoint.from_transform(W_H_B)
        B_X_W = Adjoint.from_transform(W_H_B, inverse=True)
        B_v_WB = ops.mv(B_X_W, W_v_WB)
        return ops.mv(W_X_B, O_a_WB + ops.mv(Cross.vx(B_v_WB), B_v_WB))
    if repr_ is VelRepr.Mixed:
        p = W_H_B[..., 0:3, 3]
        w = W_v_WB[..., 3:6]
        wd = O_a_WB[..., 3:6]
        pd = W_v_WB[..., 0:3] + jnp.cross(w, p)
        pdd = O_a_WB[..., 0:3]
        W_a_lin = pdd - jnp.cross(wd, p) - jnp.cross(w, pd)
        return jnp.concatenate([W_a_lin, wd], axis=-1)
    raise ValueError(repr_)


def other_representation_to_inertial_links(model, data, link_forces):
    """Convert per-link 6D forces from the data's representation to inertial.

    Body: forces are in link frames; Mixed: in link mixed frames; Inertial:
    unchanged."""
    f = jnp.asarray(link_forces, dtype=float)
    repr_ = data.velocity_representation
    if repr_ is VelRepr.Inertial:
        return f
    W_H_L = data._link_transforms
    return other_representation_to_inertial(f, repr_, W_H_L, is_force=True)


@named_scope
def free_floating_mass_matrix(model: JaxSimModel, data) -> jtp.Matrix:
    """Mass matrix in the data's representation
    (reference ``api/model.py:1529-1594``)."""
    M_body = ops.crba(model.kin_dyn_parameters, joint_positions=data.joint_positions)

    repr_ = data.velocity_representation
    if repr_ is VelRepr.Body:
        return M_body

    T = _input_repr_transform(model, data, repr_)
    n = model.number_of_joints()
    M = M_body.at[0:6, 0:6].set(T.T @ M_body[0:6, 0:6] @ T)
    M = M.at[0:6, 6:].set(T.T @ M_body[0:6, 6:])
    M = M.at[6:, 0:6].set(M_body[6:, 0:6] @ T)
    return M


@named_scope
def free_floating_mass_matrix_inverse(model: JaxSimModel, data) -> jtp.Matrix:
    """M⁻¹ in the data's representation (reference ``api/model.py:1597-1631``)."""
    Minv_body = ops.mass_inverse(
        model.kin_dyn_parameters,
        joint_positions=data.joint_positions,
        floating_base=model.floating_base(),
    )
    repr_ = data.velocity_representation
    if repr_ is VelRepr.Body:
        return Minv_body
    # M⁻¹' = T⁻¹ M⁻¹ T⁻ᵀ given M' = Tᵀ M T.
    T = _input_repr_transform(model, data, repr_)
    Tinv = Adjoint.inverse(T)
    Minv = Minv_body.at[0:6, 0:6].set(Tinv @ Minv_body[0:6, 0:6] @ Tinv.T)
    Minv = Minv.at[0:6, 6:].set(Tinv @ Minv_body[0:6, 6:])
    Minv = Minv.at[6:, 0:6].set(Minv_body[6:, 0:6] @ Tinv.T)
    return Minv


@named_scope
def inverse_dynamics(
    model: JaxSimModel,
    data,
    *,
    joint_accelerations: jtp.VectorLike | None = None,
    base_acceleration: jtp.VectorLike | None = None,
    link_forces: jtp.MatrixLike | None = None,
) -> tuple[jtp.Vector, jtp.Vector]:
    """RNEA inverse dynamics; accelerations/forces in the data's
    representation (reference ``api/model.py:1746-1894``). Returns (base
    wrench in data's repr, joint torques)."""
    n = model.number_of_joints()
    O_a_WB = (
        jnp.asarray(base_acceleration, dtype=float)
        if base_acceleration is not None
        else jnp.zeros(6)
    )
    W_a_WB = _other_acceleration_to_inertial(model, data, O_a_WB)

    W_f_L = (
        other_representation_to_inertial_links(model, data, link_forces)
        if link_forces is not None
        else None
    )

    W_f_B, tau = ops.rnea(
        model.kin_dyn_parameters,
        base_transform=data._base_transform,
        joint_positions=data.joint_positions,
        base_velocity_inertial=_base_velocity_inertial(data),
        joint_velocities=data.joint_velocities,
        base_acceleration_inertial=W_a_WB,
        joint_accelerations=joint_accelerations,
        link_forces_inertial=W_f_L,
        gravity=model.gravity_vector,
        floating_base=model.floating_base(),
    )

    # Base wrench: inertial → data's representation.
    f_B = inertial_to_other_representation(
        W_f_B, data.velocity_representation, _base_link_transform(data), is_force=True
    )
    return f_B, tau


@named_scope
def free_floating_gravity_forces(model: JaxSimModel, data) -> jtp.Vector:
    """g(q) ∈ R^{6+n} (reference ``api/model.py:1897-1934``)."""
    data_zero = data.replace(
        model=model,
        joint_velocities=jnp.zeros_like(data.joint_velocities),
        base_linear_velocity_inertial=jnp.zeros(3),
        base_angular_velocity_inertial=jnp.zeros(3),
    )
    f_B, tau = inverse_dynamics(model, data_zero)
    return jnp.concatenate([f_B, tau], axis=-1)


@named_scope
def free_floating_bias_forces(model: JaxSimModel, data) -> jtp.Vector:
    """h(q, ν) = C ν + g (reference ``api/model.py:1937-1978``)."""
    f_B, tau = inverse_dynamics(model, data)
    return jnp.concatenate([f_B, tau], axis=-1)


@named_scope
def free_floating_coriolis_matrix(model: JaxSimModel, data) -> jtp.Matrix:
    """C(q, ν) such that C ν are the Coriolis generalized forces
    (reference ``api/model.py:1634-1743``): Σ_L J_Lᵀ (M_L vx*(v_L) + M_L ... )
    computed link-wise in body-fixed representation, then converted."""
    # Body-fixed link velocities and Jacobians.
    with data.switch_velocity_representation(VelRepr.Body) as body_data:
        B_J = generalized_free_floating_jacobian(
            model, body_data, output_vel_repr=VelRepr.Body
        )
        # Body-fixed link velocities.
        L_v_WL = body_data.link_velocities

        # Jacobian derivative in body coordinates: for each link,
        # L_J̇ = d/dt(L_X_B B_J) — use the doubly-left derivative sweep.
        B_Jd_full, B_H_L = ops.jacobian_derivative_full_doubly_left(
            model.kin_dyn_parameters,
            joint_positions=data.joint_positions,
            joint_velocities=data.joint_velocities,
        )

    M_L = link_spatial_inertia_matrices(model)

    # C in body-fixed coords: Σ_L J_Lᵀ [M_L J̇_L + vx*(v_L) M_L J_L]
    kb = model.kin_dyn_parameters.support_body_array_bool
    n = model.number_of_joints()
    nl = model.number_of_links()
    base_mask = jnp.ones((nl, 6), dtype=bool)
    mask = jnp.concatenate([base_mask, kb[:, 1 : 1 + n]], axis=1)

    # Build per-link L-frame J and J̇: L_J = L_X_B B_J_masked,
    # L_J̇ = L_Ẋ_B B_J + L_X_B B_J̇ — but the doubly-left sweep gives B-frame
    # J̇; converting: v_L^L = L_X_B v_L^B ⇒ J̇_L^L = L_Ẋ_B J^B + L_X_B J̇^B,
    # with L_Ẋ_B = -vx(L_v_BL) L_X_B = vx(L_v... use L_Ẋ_B = L_X_B vx(B_v_LB)
    # and B_v_LB = -B_v_BL.
    B_J_full, _ = ops.jacobian_full_doubly_left(
        model.kin_dyn_parameters, joint_positions=data.joint_positions
    )
    L_X_B = Adjoint.from_transform(B_H_L, inverse=True)

    # B-frame velocity of L w.r.t. B: columns 6: of B_J times ṡ.
    nu_joints = jnp.concatenate([jnp.zeros(6), data.joint_velocities])
    B_v_BL = jnp.einsum(
        "lij,j->li", jnp.where(mask[:, None, :], B_J_full[None], 0.0), nu_joints
    )

    L_J = jnp.einsum(
        "lij,ljk->lik",
        L_X_B,
        jnp.where(mask[:, None, :], B_J_full[None], 0.0),
    )
    L_Xd_B = jnp.einsum("lij,ljk->lik", L_X_B, Cross.vx(-B_v_BL))
    L_Jd = jnp.einsum(
        "lij,ljk->lik", L_Xd_B, jnp.where(mask[:, None, :], B_J_full[None], 0.0)
    ) + jnp.einsum(
        "lij,ljk->lik", L_X_B, jnp.where(mask[:, None, :], B_Jd_full[None], 0.0)
    )

    C_body = jnp.einsum("lji,ljk,lkm->im", L_J, M_L, L_Jd) + jnp.einsum(
        "lji,ljk,lkm->im",
        L_J,
        Cross.vx_star(L_v_WL) @ M_L,
        L_J,
    )

    if not model.floating_base():
        # Fixed-base models: the base link contributes nothing, and the
        # base↔joint coupling blocks must be zero (reference
        # ``api/model.py:1685-1693``).
        C_base = jnp.einsum(
            "ji,jk,km->im", L_J[0], M_L[0], L_Jd[0]
        ) + jnp.einsum(
            "ji,jk,km->im", L_J[0], Cross.vx_star(L_v_WL[0]) @ M_L[0], L_J[0]
        )
        C_body = C_body - C_base
        C_body = C_body.at[0:6, 6:].set(0.0)
        C_body = C_body.at[6:, 0:6].set(0.0)

    repr_ = data.velocity_representation
    if repr_ is VelRepr.Body:
        return C_body

    # Representation change: C' = Tᵀ C T + Tᵀ M Ṫ (reference
    # ``api/model.py:1715-1743``): build T and Ṫ block-diagonals.
    T6 = _input_repr_transform(model, data, repr_)
    W_H_B = _base_link_transform(data)
    W_v_WB = _base_velocity_inertial(data)
    if repr_ is VelRepr.Inertial:
        B_X_W = T6
        B_v_WB = ops.mv(B_X_W, W_v_WB)
        Td6 = -Cross.vx(B_v_WB) @ B_X_W
    else:  # Mixed
        W_H_BW = W_H_B.at[0:3, 0:3].set(jnp.eye(3))
        B_X_BW = T6
        BW_v_WB = inertial_to_other_representation(
            W_v_WB, VelRepr.Mixed, W_H_B, is_force=False
        )
        BW_v_W_BW = BW_v_WB.at[3:6].set(jnp.zeros(3))
        BW_v_BW_B = BW_v_WB - BW_v_W_BW
        Td6 = -B_X_BW @ Cross.vx(BW_v_BW_B)

    n_full = 6 + model.number_of_joints()
    T = jnp.eye(n_full).at[0:6, 0:6].set(T6)
    Td = jnp.zeros((n_full, n_full)).at[0:6, 0:6].set(Td6)

    M_body = ops.crba(model.kin_dyn_parameters, joint_positions=data.joint_positions)
    return T.T @ C_body @ T + T.T @ M_body @ Td


@named_scope
def forward_dynamics_crb(
    model: JaxSimModel,
    data,
    *,
    joint_forces: jtp.VectorLike | None = None,
    link_forces: jtp.MatrixLike | None = None,
) -> tuple[jtp.Vector, jtp.Vector]:
    """Forward dynamics via M⁻¹(τ + Jᵀf − h)
    (reference ``api/model.py:1426-1498``)."""
    n = model.number_of_joints()
    tau = (
        jnp.asarray(joint_forces, dtype=float)
        if joint_forces is not None
        else jnp.zeros(n)
    )
    f_L = (
        jnp.asarray(link_forces, dtype=float)
        if link_forces is not None
        else jnp.zeros((model.number_of_links(), 6))
    )

    M = free_floating_mass_matrix(model, data)
    h = free_floating_bias_forces(model, data)
    J = generalized_free_floating_jacobian(model, data)

    S_tau = jnp.concatenate([jnp.zeros(6), tau])
    JTf = jnp.einsum("lji,lj->i", J, f_L)
    rhs = S_tau + JTf - h

    if model.floating_base():
        nu_dot = jnp.linalg.solve(M, rhs)
    else:
        sdd = jnp.linalg.solve(M[6:, 6:], rhs[6:])
        nu_dot = jnp.concatenate([jnp.zeros(6), sdd])

    return nu_dot[0:6], nu_dot[6:]


# ===============
# Momentum/energy
# ===============


@named_scope
def locked_spatial_inertia(model: JaxSimModel, data) -> jtp.Matrix:
    """Locked 6D inertia of the whole model (reference ``api/model.py:1986``)."""
    return free_floating_mass_matrix(model, data)[0:6, 0:6]


@named_scope
def total_momentum(model: JaxSimModel, data) -> jtp.Vector:
    """Total 6D momentum in the active representation
    (reference ``api/model.py:2005-2037``)."""
    nu = data.generalized_velocity
    M = free_floating_mass_matrix(model, data)
    return (M @ nu)[0:6]


@named_scope
def total_momentum_jacobian(
    model: JaxSimModel, data, *, output_vel_repr: VelRepr | None = None
) -> jtp.Matrix:
    """J such that J ν = total momentum (reference ``api/model.py:2040-2089``)."""
    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )
    M = free_floating_mass_matrix(model, data)
    J = M[0:6, :]
    if output_vel_repr is data.velocity_representation:
        return J
    # Momentum is a force-like covector: h_O = (C_X_O)^T h_C, where C is the
    # data's base-velocity frame and O the requested output frame. Both frames
    # are expressed relative to the body frame via _input_repr_transform
    # (T = B_X_repr), so C_X_O = (B_X_C)^-1 @ B_X_O.
    T_C = _input_repr_transform(model, data, data.velocity_representation)
    T_O = _input_repr_transform(model, data, output_vel_repr)
    C_X_O = jnp.linalg.solve(T_C, T_O)
    return C_X_O.T @ J


@named_scope
def average_velocity(model: JaxSimModel, data) -> jtp.Vector:
    """Locked-inertia average 6D velocity (reference ``api/model.py:2092``)."""
    nu = data.generalized_velocity
    J = average_velocity_jacobian(model, data)
    return J @ nu


@named_scope
def average_velocity_jacobian(
    model: JaxSimModel, data, *, output_vel_repr: VelRepr | None = None
) -> jtp.Matrix:
    """J_avg = I_locked⁻¹ J_momentum (reference ``api/model.py:2119-2169``)."""
    M = free_floating_mass_matrix(model, data)
    I_locked = M[0:6, 0:6]
    J_mom = M[0:6, :]
    return jnp.linalg.solve(I_locked, J_mom)


@named_scope
def mechanical_energy(model: JaxSimModel, data) -> jtp.Float:
    return kinetic_energy(model, data) + potential_energy(model, data)


@named_scope
def kinetic_energy(model: JaxSimModel, data) -> jtp.Float:
    nu = data.generalized_velocity
    M = free_floating_mass_matrix(model, data)
    return 0.5 * jnp.einsum("i,ij,j->", nu, M, nu)


@named_scope
def potential_energy(model: JaxSimModel, data) -> jtp.Float:
    m = model.kin_dyn_parameters.link_parameters.mass
    W_H_L = data._link_transforms
    L_p_com = model.kin_dyn_parameters.link_parameters.center_of_mass
    W_p_com = (
        jnp.einsum("lij,lj->li", W_H_L[:, 0:3, 0:3], L_p_com) + W_H_L[:, 0:3, 3]
    )
    g = -model.gravity  # positive magnitude
    return jnp.sum(m * g * W_p_com[:, 2])


# ====
# Step
# ====


@named_scope
def step(
    model: JaxSimModel,
    data,
    *,
    link_forces: jtp.MatrixLike | None = None,
    joint_force_references: jtp.VectorLike | None = None,
):
    """Advance the simulation by one ``model.time_step``
    (reference ``api/model.py:2601-2681``).

    Args:
        model: The model.
        data: The current state.
        link_forces: Optional ``(nL, 6)`` external forces in the data's
            representation.
        joint_force_references: Optional ``(n,)`` joint force references.

    Returns:
        The new data after one integration step.
    """
    from . import actuation_model as js_actuation
    from . import integrators as js_integrators

    # Fast-path auto-dispatch: when the model configuration is inside the
    # BatchedEngine envelope (and there are no external link forces), the
    # step routes through the engine — reference-style user code gets
    # engine speed without hand-migrating to BatchedEngine (single
    # entry-point ergonomics of reference ``api/model.py:2601``).
    eng = _resolve_step_engine(model, link_forces)
    if eng is not None:
        tau_total = js_actuation.compute_resultant_torques(
            model, data, joint_force_references=joint_force_references
        )
        return _engine_step(model, eng, data, tau_total)

    # External forces → inertial.
    W_f_L = (
        other_representation_to_inertial_links(model, data, link_forces)
        if link_forces is not None
        else jnp.zeros((model.number_of_links(), 6))
    )

    # Resultant joint torques (references + limits + friction + tn-curve).
    tau_total = js_actuation.compute_resultant_torques(
        model, data, joint_force_references=joint_force_references
    )

    integrator_fn = js_integrators._INTEGRATORS_MAP[model.integrator]
    data_tf = integrator_fn(
        model=model,
        data=data,
        link_forces_inertial=W_f_L,
        joint_torques=tau_total,
    )

    data_tf = model.contact_model.update_velocity_after_impact(model, data_tf)
    return data_tf


_ENGINE_FALLBACK_WARNED: set = set()
_STEP_ENGINE_CACHE: dict = {}
# Identity front cache: id(model) -> (weakref(model), engine). Eager
# (non-jitted) step() calls hit this without blake2b-hashing every model
# leaf (which forces device-to-host transfers of the whole kin_dyn tree);
# the weakref identity check guards against id() reuse after gc.
_STEP_ENGINE_ID_CACHE: dict = {}


def _model_numeric_leaves(model):
    """The dynamic leaves the engine freezes into compile-time constants."""
    return jax.tree.leaves(
        (
            model.time_step,
            model.kin_dyn_parameters,
            model.contact_params,
            model.actuation_params,
        )
    )


def _build_step_engine(model):
    from jaxsim_tpu.ops.batched_engine import BatchedEngine

    # Fast path: the exact same model OBJECT was seen before (the common
    # eager-stepping pattern) — skip the content hash entirely.
    import weakref

    hit = _STEP_ENGINE_ID_CACHE.get(id(model))
    if hit is not None and hit[0]() is model:
        return hit[1]

    # The engine freezes the model's NUMERIC content into static tuples, so
    # the cache must key on that content — hash(model)/hash(kin_dyn) are
    # deliberately topology-only (JIT recompile discipline) and would alias
    # models differing only in time_step / gravity / masses / contact
    # parameters to one stale engine.
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for leaf in _model_numeric_leaves(model):
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    key = (hash(model), float(model.gravity), h.digest())

    eng = _STEP_ENGINE_CACHE.get(key)
    if eng is None:
        # step() is usually called inside jit: ensure_compile_time_eval keeps
        # the engine build's jnp ops on the (concrete, closed-over) model
        # arrays eager — without it every constant becomes a tracer and the
        # static freeze fails. A genuinely traced model still fails here and
        # falls back to the generic path.
        with jax.ensure_compile_time_eval():
            eng = BatchedEngine.build(model)
        # Evict oldest-first (dict preserves insertion order) so hot
        # engines survive workloads cycling through many model variants.
        while len(_STEP_ENGINE_CACHE) >= 64:
            del _STEP_ENGINE_CACHE[next(iter(_STEP_ENGINE_CACHE))]
        _STEP_ENGINE_CACHE[key] = eng
    while len(_STEP_ENGINE_ID_CACHE) >= 64:
        del _STEP_ENGINE_ID_CACHE[next(iter(_STEP_ENGINE_ID_CACHE))]
    _STEP_ENGINE_ID_CACHE[id(model)] = (weakref.ref(model), eng)
    return eng


def _resolve_step_engine(model, link_forces):
    """Engine for the step fast path, or None for the generic path."""
    if model.backend == "generic":
        return None

    from jaxsim_tpu.utils.tracing import tracing

    reason = None
    if link_forces is not None:
        reason = "external link forces are not lowered into the engine"
    elif any(map(tracing, _model_numeric_leaves(model))):
        # The engine freezes model arrays into static tuples: a model
        # whose leaves are tracers (jit over the MODEL, or differentiating
        # w.r.t. model parameters) cannot build one. Closing the model
        # over the jit (the common pattern) keeps the fast path.
        reason = "model arrays are traced (close the model over jit instead)"
    else:
        try:
            return _build_step_engine(model)
        except Exception as e:  # noqa: BLE001 — outside the engine envelope
            reason = str(e)

    if model.backend == "engine":
        raise ValueError(f"backend='engine' requested but: {reason}")
    key = (model.model_name, reason)
    if key not in _ENGINE_FALLBACK_WARNED:
        _ENGINE_FALLBACK_WARNED.add(key)
        logging.warning(
            f"js.model.step falls back to the generic path for model"
            f" {model.model_name!r}: {reason}"
        )
    return None


def _engine_step(model, eng, data, tau_total):
    """One engine step on a SINGLE env's data (vmap adds batching)."""
    from jaxsim_tpu.ops.batched_engine import BatchedState

    m = data.contact_state.get("tangential_deformation")
    if m is None or eng.n_points == 0:
        m = jnp.zeros((eng.m_rows, 3))
    elif eng.contact_model in ("rigid", "relaxed_rigid"):
        # For rigid/relaxed engines the m slot carries APGD/PCG warm-start
        # forces — internal solver state the generic data doesn't track.
        m = jnp.zeros((eng.m_rows, 3))
    st = BatchedState(
        s=data.joint_positions,
        sd=data.joint_velocities,
        p=data.base_position,
        q=data.base_quaternion,
        v=jnp.concatenate(
            [
                data.base_linear_velocity_inertial,
                data.base_angular_velocity_inertial,
            ]
        ),
        m=m,
    )
    out = eng.step(st, tau_total)

    contact_state = data.contact_state
    if eng.contact_model == "soft" and eng.n_points > 0:
        contact_state = {"tangential_deformation": out.m[: eng.n_points]}

    import jaxsim_tpu.api as js

    new = js.JaxSimModelData.build(
        model,
        base_position=out.p,
        base_quaternion=out.q,
        joint_positions=out.s,
        base_linear_velocity=out.v[0:3],
        base_angular_velocity=out.v[3:6],
        joint_velocities=out.sd,
        velocity_representation=VelRepr.Inertial,
        contact_state=contact_state,
    )
    # Internal storage is representation-invariant: restore the caller's
    # active representation without touching the stored inertial state.
    return dataclasses.replace(
        new, velocity_representation=data.velocity_representation
    )


@named_scope
def generalized_free_floating_jacobian_derivative(
    model: JaxSimModel,
    data,
    *,
    output_vel_repr: VelRepr | None = None,
) -> jtp.Array:
    r"""``(nL, 6, 6+n)`` link Jacobian derivatives with full representation
    calculus (reference ``api/model.py:1048-1228``):

        J̇ = Ȯ_X_B (B_J) T + O_X_B (B_J̇) T + O_X_B (B_J) Ṫ
    """
    from jaxsim_tpu.math import Skew

    output_vel_repr = (
        output_vel_repr if output_vel_repr is not None else data.velocity_representation
    )
    repr_in = data.velocity_representation
    nl = model.number_of_links()
    n = model.number_of_joints()

    B_J_full, B_H_L = ops.jacobian_full_doubly_left(
        model.kin_dyn_parameters, joint_positions=data.joint_positions
    )
    B_Jd_full, _ = ops.jacobian_derivative_full_doubly_left(
        model.kin_dyn_parameters,
        joint_positions=data.joint_positions,
        joint_velocities=data.joint_velocities,
    )

    kb = model.kin_dyn_parameters.support_body_array_bool
    base_mask = jnp.ones((nl, 6), dtype=bool)
    mask = jnp.concatenate([base_mask, kb[:, 1 : 1 + n]], axis=1)
    B_J = jnp.where(mask[:, None, :], B_J_full[None], 0.0)  # (nL, 6, 6+n)
    B_Jd = jnp.where(mask[:, None, :], B_Jd_full[None], 0.0)

    W_H_B = _base_link_transform(data)
    W_v_WB = _base_velocity_inertial(data)
    B_X_W = Adjoint.from_transform(W_H_B, inverse=True)
    B_v_WB = ops.mv(B_X_W, W_v_WB)

    # ----- input transform T (6×6 base block) and its derivative -----
    if repr_in is VelRepr.Body:
        T6 = jnp.eye(6)
        Td6 = jnp.zeros((6, 6))
    elif repr_in is VelRepr.Inertial:
        T6 = B_X_W
        Td6 = -Cross.vx(B_v_WB) @ B_X_W
    else:  # Mixed input
        T6 = _input_repr_transform(model, data, VelRepr.Mixed)  # B_X_BW
        BW_v_WB = inertial_to_other_representation(
            W_v_WB, VelRepr.Mixed, W_H_B, is_force=False
        )
        BW_v_BW_B = BW_v_WB.at[0:3].set(jnp.zeros(3))  # [0; ω]
        Td6 = -T6 @ Cross.vx(BW_v_BW_B)

    n_full = 6 + n
    eyes = jnp.eye(n_full)
    T = eyes.at[0:6, 0:6].set(T6)
    Td = jnp.zeros((n_full, n_full)).at[0:6, 0:6].set(Td6)

    # ----- output transform O_X_B per link and its derivative -----
    W_v_WL = data._link_velocities  # (nL, 6) inertial
    B_v_WL = jnp.einsum("ij,lj->li", B_X_W, W_v_WL)

    if output_vel_repr is VelRepr.Body:
        O_X_B = Adjoint.from_transform(B_H_L, inverse=True)  # L_X_B
        # L_Ẋ_B = L_X_B vx(B_v_LB) with B_v_LB = B_v_WB − B_v_WL.
        B_v_LB = B_v_WB[None, :] - B_v_WL
        O_Xd_B = jnp.einsum("lij,ljk->lik", O_X_B, Cross.vx(B_v_LB))
    elif output_vel_repr is VelRepr.Inertial:
        W_X_B = Adjoint.from_transform(W_H_B)
        O_X_B = jnp.broadcast_to(W_X_B, (nl, 6, 6))
        O_Xd_B = jnp.broadcast_to(W_X_B @ Cross.vx(B_v_WB), (nl, 6, 6))
    else:  # Mixed output: LW frame per link
        p_L = data._link_transforms[:, 0:3, 3]
        # LW_X_W = [[I, -p̂],[0, I]]; LW_X_B = LW_X_W W_X_B.
        W_X_B = Adjoint.from_transform(W_H_B)
        LW_X_W = (
            jnp.broadcast_to(jnp.eye(6), (nl, 6, 6))
            .at[:, 0:3, 3:6]
            .set(-Skew.wedge(p_L))
        )
        O_X_B = jnp.einsum("lij,jk->lik", LW_X_W, W_X_B)
        # Mixed linear velocity of each link origin.
        pd_L = W_v_WL[:, 0:3] + jnp.cross(W_v_WL[:, 3:6], p_L)
        LWd_X_W = (
            jnp.zeros((nl, 6, 6)).at[:, 0:3, 3:6].set(-Skew.wedge(pd_L))
        )
        O_Xd_B = jnp.einsum("lij,jk->lik", LWd_X_W, W_X_B) + jnp.einsum(
            "lij,jk->lik", LW_X_W, W_X_B @ Cross.vx(B_v_WB)
        )

    term1 = jnp.einsum("lij,ljk,km->lim", O_Xd_B, B_J, T)
    term2 = jnp.einsum("lij,ljk,km->lim", O_X_B, B_Jd, T)
    term3 = jnp.einsum("lij,ljk,km->lim", O_X_B, B_J, Td)
    return term1 + term2 + term3


@named_scope
def link_bias_accelerations(model: JaxSimModel, data) -> jtp.Array:
    """``(nL, 6)`` J̇ ν of every link in the active representation
    (reference ``api/model.py:2177-2387``)."""
    Jd = generalized_free_floating_jacobian_derivative(model, data)
    nu = data.generalized_velocity
    return jnp.einsum("lij,j->li", Jd, nu)


@named_scope
def forward_dynamics(
    model: JaxSimModel,
    data,
    *,
    joint_forces: jtp.VectorLike | None = None,
    link_forces: jtp.MatrixLike | None = None,
    prefer_aba: bool = True,
) -> tuple[jtp.Vector, jtp.Vector]:
    """Forward dynamics, ABA by default (reference ``api/model.py:1231``)."""
    fn = forward_dynamics_aba if prefer_aba else forward_dynamics_crb
    return fn(model, data, joint_forces=joint_forces, link_forces=link_forces)


# Hardware-parametrization entry points re-exported at the reference's
# locations (implementation in jaxsim_tpu.api.hw_parameters).
def compute_hw_link_metadata(model: JaxSimModel):
    from . import hw_parameters as _hw

    return _hw.compute_hw_link_metadata(model)


def update_hw_parameters(model: JaxSimModel, scaling_factors):
    from . import hw_parameters as _hw

    return _hw.update_hw_parameters(model, scaling_factors)


def export_updated_model(model: JaxSimModel) -> str:
    from . import hw_parameters as _hw

    return _hw.export_updated_model(model)
