"""Joint kinematic model.

Role of reference ``src/jaxsim/math/joint_model.py:16-200``, redesigned for
TPU: instead of a per-joint ``lax.switch`` over joint types, all joint
transforms are computed batched for every joint at once and blended with
static type masks — one fused vectorized expression, no control flow.

Joint index convention (same as reference): index 0 is the dummy world→base
joint; joint i (1-based) has child link i.
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.utils import pytree_dataclass, static_field

from .rotation import Rotation


class JointType:
    """Integer joint types (reference ``parsers/descriptions/joint.py``)."""

    Fixed = 0
    Revolute = 1
    Prismatic = 2


@pytree_dataclass
class JointModel:
    """Fixed joint transforms + static metadata.

    Attributes:
        λ_H_pre: ``(1+n_joints, 4, 4)`` parent-link → joint-predecessor frames.
        suc_H_i: ``(1+n_joints, 4, 4)`` joint-successor → child-link frames
            (index 0 stores the base pose w.r.t. the model root frame).
        joint_axis: ``(n_joints, 3)`` motion axes (dynamic, differentiable).
        joint_dofs/joint_names/joint_types: static per-joint metadata, index 0
            being the world→base joint.
    """

    lambda_H_pre: jtp.Array
    suc_H_i: jtp.Array
    joint_axis: jtp.Array

    joint_dofs: tuple[int, ...] = static_field(default=())
    joint_names: tuple[str, ...] = static_field(default=())
    joint_types: tuple[int, ...] = static_field(default=())

    @staticmethod
    def build(description) -> "JointModel":
        """Build from a :class:`~jaxsim_tpu.parsers.descriptions.ModelDescription`.

        Computes the fixed frame offsets with the offline (NumPy) graph FK at
        the initial joint configuration, mirroring reference
        ``math/joint_model.py:45-113``.
        """
        import numpy as np

        from jaxsim_tpu.parsers.kinematic_graph import KinematicGraphTransforms

        ordered_links = sorted(description.links_dict.values(), key=lambda l: l.index)
        ordered_joints = sorted(description.joints_dict.values(), key=lambda j: j.index)

        n = len(ordered_joints)
        lambda_H_pre = np.zeros((1 + n, 4, 4))
        suc_H_i = np.zeros((1 + n, 4, 4))
        lambda_H_pre[0] = np.eye(4)
        # Index 0 stores the (optional) base pose w.r.t. the model root frame.
        suc_H_i[0] = np.asarray(ordered_links[0].pose)

        fk = KinematicGraphTransforms(graph=description)
        for joint in ordered_joints:
            lambda_H_pre[joint.index] = fk.relative_transform(
                relative_to=joint.parent.name, name=joint.name
            )
            suc_H_i[joint.index] = fk.relative_transform(
                relative_to=joint.name, name=joint.child.name
            )

        axes = (
            np.stack([np.asarray(j.axis).squeeze() for j in ordered_joints])
            if n > 0
            else np.zeros((0, 3))
        )

        base_dofs = 0 if description.fixed_base else 6

        return JointModel(
            # NumPy leaves: KinDynParameters.build device_puts the whole
            # parameter pack in one transfer at the end.
            lambda_H_pre=np.asarray(lambda_H_pre, dtype=float),
            suc_H_i=np.asarray(suc_H_i, dtype=float),
            joint_axis=np.asarray(axes, dtype=float),
            joint_dofs=tuple([base_dofs] + [1] * n),
            joint_names=tuple(["world_to_base"] + [j.name for j in ordered_joints]),
            joint_types=tuple([JointType.Fixed] + [j.jtype for j in ordered_joints]),
        )

    def parent_H_predecessor(self, joint_index: jtp.IntLike) -> jtp.Matrix:
        return self.lambda_H_pre[joint_index]

    def successor_H_child(self, joint_index: jtp.IntLike) -> jtp.Matrix:
        return self.suc_H_i[joint_index]


def supported_joint_motion(
    joint_types: jtp.VectorLike,
    joint_positions: jtp.VectorLike,
    joint_axes: jtp.MatrixLike,
) -> jtp.Matrix:
    """Batched pre_H_suc(s) for every joint simultaneously.

    Args:
        joint_types: ``(n,)`` integer types (Fixed/Revolute/Prismatic).
        joint_positions: ``(..., n)`` joint positions.
        joint_axes: ``(n, 3)`` motion axes.

    Returns:
        ``(..., n, 4, 4)`` joint transforms.

    TPU note: the reference dispatches per joint with ``lax.switch``
    (``math/joint_model.py:149-200``); here the revolute and prismatic
    transforms are computed for every joint in one vectorized expression and
    blended with masks — cheaper than control flow, fully batched.
    """
    types = jnp.asarray(joint_types)
    s = jnp.asarray(joint_positions, dtype=float)
    axes = jnp.asarray(joint_axes, dtype=float)

    rotvec = s[..., None] * axes  # (..., n, 3)
    R = Rotation.from_axis_angle(rotvec)  # (..., n, 3, 3)

    is_rev = (types == JointType.Revolute)[..., None, None]
    is_prism = (types == JointType.Prismatic)[..., None, None]

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=s.dtype), R.shape)
    Rj = jnp.where(is_rev, R, eye3)
    pj = jnp.where(is_prism[..., 0], rotvec, jnp.zeros_like(rotvec))

    top = jnp.concatenate([Rj, pj[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=s.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)
