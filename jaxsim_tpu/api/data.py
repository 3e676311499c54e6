"""Time-varying model state with cached kinematics.

Role of reference ``src/jaxsim/api/data.py:26-682``. The physical state
(joint positions/velocities, base pose, base velocity stored inertial-fixed)
is augmented with caches — base transform, link transforms, inertial link
velocities — refreshed on every ``replace`` that touches kinematic inputs.
This cache-on-write design lets contacts and frame queries skip FK at read
time (reference ``api/data.py:405-523``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu import exceptions, ops
from jaxsim_tpu.math import Quaternion, Transform
from jaxsim_tpu.utils import pytree_dataclass

from .common import (
    ModelDataWithVelocityRepresentation,
    VelRepr,
    inertial_to_other_representation,
    named_scope,
    other_representation_to_inertial,
)

_KINEMATIC_FIELDS = (
    "joint_positions",
    "joint_velocities",
    "base_position",
    "base_quaternion",
    "base_linear_velocity_inertial",
    "base_angular_velocity_inertial",
)


@pytree_dataclass
class JaxSimModelData(ModelDataWithVelocityRepresentation):
    """State of a :class:`~jaxsim_tpu.api.model.JaxSimModel`."""

    joint_positions: jtp.Vector = None
    joint_velocities: jtp.Vector = None
    base_position: jtp.Vector = None
    base_quaternion: jtp.Vector = None
    base_linear_velocity_inertial: jtp.Vector = None
    base_angular_velocity_inertial: jtp.Vector = None

    # Caches (recomputed on kinematic replace).
    _base_transform: jtp.Matrix = None
    _link_transforms: jtp.Array = None
    _link_velocities: jtp.Array = None

    contact_state: dict[str, jtp.PyTree] = dataclasses.field(default_factory=dict)

    # ----- construction -----

    @staticmethod
    @named_scope
    def build(
        model,
        *,
        base_position: jtp.VectorLike | None = None,
        base_quaternion: jtp.VectorLike | None = None,
        joint_positions: jtp.VectorLike | None = None,
        base_linear_velocity: jtp.VectorLike | None = None,
        base_angular_velocity: jtp.VectorLike | None = None,
        joint_velocities: jtp.VectorLike | None = None,
        velocity_representation: VelRepr = VelRepr.Mixed,
        contact_state: dict[str, jtp.PyTree] | None = None,
    ) -> "JaxSimModelData":
        """Build data; velocities are interpreted in
        ``velocity_representation`` (reference ``api/data.py:65-202``)."""
        n = model.number_of_joints()

        s = (
            jnp.atleast_1d(jnp.asarray(joint_positions, dtype=float))
            if joint_positions is not None
            else jnp.zeros(n)
        )
        sd = (
            jnp.atleast_1d(jnp.asarray(joint_velocities, dtype=float))
            if joint_velocities is not None
            else jnp.zeros(n)
        )
        W_p_B = (
            jnp.asarray(base_position, dtype=float)
            if base_position is not None
            else jnp.zeros(3)
        )
        W_Q_B = (
            jnp.asarray(base_quaternion, dtype=float)
            if base_quaternion is not None
            else jnp.array([1.0, 0, 0, 0])
        )
        # Runtime validation (CPU opt-in, JAXSIM_ENABLE_EXCEPTIONS=1):
        # garbage quaternions fail loudly here instead of flowing into FK.
        exceptions.validate_quaternion(W_Q_B)
        v_lin = (
            jnp.asarray(base_linear_velocity, dtype=float)
            if base_linear_velocity is not None
            else jnp.zeros(3)
        )
        v_ang = (
            jnp.asarray(base_angular_velocity, dtype=float)
            if base_angular_velocity is not None
            else jnp.zeros(3)
        )

        W_H_B = Transform.from_quaternion_and_translation(
            W_Q_B, W_p_B, normalize_quaternion=True
        )
        v_other = jnp.concatenate([v_lin, v_ang], axis=-1)
        W_v_WB = other_representation_to_inertial(
            v_other, velocity_representation, W_H_B, is_force=False
        )

        contact_state = (
            contact_state
            if contact_state is not None
            else model.contact_model.zero_state_variables(model)
        )

        data = JaxSimModelData(
            velocity_representation=velocity_representation,
            joint_positions=s,
            joint_velocities=sd,
            base_position=W_p_B,
            base_quaternion=W_Q_B,
            base_linear_velocity_inertial=W_v_WB[..., 0:3],
            base_angular_velocity_inertial=W_v_WB[..., 3:6],
            _base_transform=W_H_B,
            _link_transforms=None,
            _link_velocities=None,
            contact_state=contact_state,
        )
        return data.update_cache(model)

    @staticmethod
    def zero(
        model, velocity_representation: VelRepr = VelRepr.Mixed
    ) -> "JaxSimModelData":
        return JaxSimModelData.build(
            model, velocity_representation=velocity_representation
        )

    # ----- cache management -----

    def update_cache(self, model) -> "JaxSimModelData":
        """Recompute all kinematic caches from the current state, handling an
        arbitrary batch on the leading axes (reference ``data.py:442-508``)."""

        s = self.joint_positions
        batch_dims = s.ndim - 1

        def fk_full(s, sd, q, p, vl, va):
            H = Transform.from_quaternion_and_translation(
                q, p, normalize_quaternion=True
            )
            W_v_WB = jnp.concatenate([vl, va], axis=-1)
            W_H_L, W_v_WL = ops.forward_kinematics_model(
                model.kin_dyn_parameters,
                base_transform=H,
                joint_positions=s,
                base_velocity_inertial=W_v_WB,
                joint_velocities=sd,
            )
            return H, W_H_L, W_v_WL

        f = fk_full
        for _ in range(batch_dims):
            f = jax.vmap(f)

        H, W_H_L, W_v_WL = f(
            s,
            self.joint_velocities,
            self.base_quaternion,
            self.base_position,
            self.base_linear_velocity_inertial,
            self.base_angular_velocity_inertial,
        )
        return dataclasses.replace(
            self,
            _base_transform=H,
            _link_transforms=W_H_L,
            _link_velocities=W_v_WL,
        )

    def replace(self, model=None, validate: bool = False, **updates) -> "JaxSimModelData":
        """Functional update. If a kinematic field changes and ``model`` is
        provided, the caches are refreshed."""
        if "base_quaternion" in updates:
            q = jnp.asarray(updates["base_quaternion"], dtype=float)
            updates["base_quaternion"] = q

        new = dataclasses.replace(self, **updates)
        if model is not None and any(k in updates for k in _KINEMATIC_FIELDS):
            new = new.update_cache(model)
        return new

    # ----- properties -----

    @property
    def base_transform(self) -> jtp.Matrix:
        """World→base SE(3) transform (cached)."""
        return self._base_transform

    @property
    def base_orientation(self) -> jtp.Vector:
        """Base quaternion (wxyz), normalized."""
        return Quaternion.normalize(self.base_quaternion)

    @property
    def base_velocity(self) -> jtp.Vector:
        """Base 6D velocity in the active representation."""
        W_v_WB = jnp.concatenate(
            [self.base_linear_velocity_inertial, self.base_angular_velocity_inertial],
            axis=-1,
        )
        return inertial_to_other_representation(
            W_v_WB,
            self.velocity_representation,
            self._base_transform,
            is_force=False,
        )

    @property
    def generalized_position(self) -> tuple[jtp.Matrix, jtp.Vector]:
        return (self._base_transform, self.joint_positions)

    @property
    def generalized_velocity(self) -> jtp.Vector:
        """ν = [base 6D velocity (active repr); joint velocities]."""
        return jnp.concatenate(
            [self.base_velocity, self.joint_velocities], axis=-1
        )

    @property
    def link_transforms(self) -> jtp.Array:
        """``(nL, 4, 4)`` world link poses (cached)."""
        return self._link_transforms

    @property
    def link_velocities(self) -> jtp.Array:
        """``(nL, 6)`` link velocities in the active representation."""
        W_v_WL = self._link_velocities
        return inertial_to_other_representation(
            W_v_WL,
            self.velocity_representation,
            self._link_transforms,
            is_force=False,
        )

    def reset_base_pose(
        self, model, *, base_position=None, base_quaternion=None
    ) -> "JaxSimModelData":
        """Functional reset of the base pose (reference ``api/data.py``)."""
        updates = {}
        if base_position is not None:
            updates["base_position"] = jnp.asarray(base_position, dtype=float)
        if base_quaternion is not None:
            updates["base_quaternion"] = Quaternion.normalize(
                jnp.asarray(base_quaternion, dtype=float)
            )
        return self.replace(model=model, **updates)

    def reset_base_quaternion(self, model, base_quaternion) -> "JaxSimModelData":
        return self.reset_base_pose(model, base_quaternion=base_quaternion)

    def reset_joint_positions(self, model, positions) -> "JaxSimModelData":
        return self.replace(
            model=model, joint_positions=jnp.asarray(positions, dtype=float)
        )

    # ----- validity -----

    def valid(self, model) -> bool:
        """Shape-compatibility check (reference ``data.py:525-549``)."""
        n = model.number_of_joints()
        nl = model.number_of_links()
        try:
            return (
                self.joint_positions.shape[-1] == n
                and self.joint_velocities.shape[-1] == n
                and self.base_position.shape[-1] == 3
                and self.base_quaternion.shape[-1] == 4
                and self._link_transforms.shape[-3] == nl
            )
        except (AttributeError, IndexError, TypeError):
            return False


@named_scope
def random_model_data(
    model,
    *,
    key: jax.Array | None = None,
    velocity_representation: VelRepr = VelRepr.Mixed,
    base_pos_bounds=((-1.0, -1.0, 0.5), (1.0, 1.0, 1.5)),
    base_vel_lin_bounds=(-1.0, 1.0),
    base_vel_ang_bounds=(-1.0, 1.0),
    joint_vel_bounds=(-1.0, 1.0),
) -> JaxSimModelData:
    """Random (valid) model data (reference ``api/data.py:552-682``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    n = model.number_of_joints()
    p_min = jnp.array(base_pos_bounds[0], dtype=float)
    p_max = jnp.array(base_pos_bounds[1], dtype=float)

    base_position = jax.random.uniform(k1, (3,), minval=p_min, maxval=p_max)
    base_quaternion = Quaternion.normalize(jax.random.normal(k2, (4,)))

    from . import joint as js_joint

    s_min = model.kin_dyn_parameters.joint_parameters.position_limits_min
    s_max = model.kin_dyn_parameters.joint_parameters.position_limits_max
    s_min = jnp.where(jnp.isfinite(s_min), s_min, -jnp.pi)
    s_max = jnp.where(jnp.isfinite(s_max), s_max, jnp.pi)
    joint_positions = jax.random.uniform(k3, (n,), minval=s_min, maxval=s_max)

    return JaxSimModelData.build(
        model,
        base_position=base_position,
        base_quaternion=base_quaternion,
        joint_positions=joint_positions,
        base_linear_velocity=jax.random.uniform(
            k4, (3,), minval=base_vel_lin_bounds[0], maxval=base_vel_lin_bounds[1]
        )
        * (1.0 if model.floating_base() else 0.0),
        base_angular_velocity=jax.random.uniform(
            k5, (3,), minval=base_vel_ang_bounds[0], maxval=base_vel_ang_bounds[1]
        )
        * (1.0 if model.floating_base() else 0.0),
        joint_velocities=jax.random.uniform(
            k6, (n,), minval=joint_vel_bounds[0], maxval=joint_vel_bounds[1]
        ),
        velocity_representation=velocity_representation,
    )
