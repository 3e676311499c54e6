"""Joint-level API (reference ``src/jaxsim/api/joint.py``).

Public indices are 0-based over the actuated joints; internally joint i has
index i+1 in the kinematic tree (= its child link index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .common import named_scope


def name_to_idx(model, *, joint_name: str) -> int:
    if joint_name not in model.joint_names():
        raise ValueError(f"Joint '{joint_name}' not found in the model")
    return model.joint_names().index(joint_name)


def idx_to_name(model, *, joint_index: int) -> str:
    return model.joint_names()[int(joint_index)]


def names_to_idxs(model, *, joint_names) -> jtp.Vector:
    return jnp.array(
        [name_to_idx(model, joint_name=n) for n in joint_names], dtype=int
    )


def idxs_to_names(model, *, joint_indices) -> tuple[str, ...]:
    return tuple(idx_to_name(model, joint_index=i) for i in joint_indices)


@named_scope
def position_limit(
    model, *, joint_index: jtp.IntLike
) -> tuple[jtp.Float, jtp.Float]:
    """(min, max) position limits of a joint (reference ``joint.py:111-148``)."""
    jp = model.kin_dyn_parameters.joint_parameters
    return (
        jp.position_limits_min[joint_index],
        jp.position_limits_max[joint_index],
    )


@named_scope
def position_limits(model) -> tuple[jtp.Vector, jtp.Vector]:
    jp = model.kin_dyn_parameters.joint_parameters
    return jp.position_limits_min, jp.position_limits_max


@named_scope
def random_joint_positions(
    model,
    *,
    joint_names: tuple[str, ...] | None = None,
    key: jax.Array | None = None,
) -> jtp.Vector:
    """Random positions within (clipped) limits
    (reference ``joint.py:184-277``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    s_min, s_max = position_limits(model)
    s_min = jnp.where(jnp.isfinite(s_min), s_min, -jnp.pi)
    s_max = jnp.where(jnp.isfinite(s_max), s_max, jnp.pi)
    if joint_names is not None:
        idx = names_to_idxs(model, joint_names=joint_names)
        s_min, s_max = s_min[idx], s_max[idx]
    return jax.random.uniform(
        key, shape=s_min.shape, minval=s_min, maxval=s_max
    )
