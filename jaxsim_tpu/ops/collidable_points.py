"""Collidable point kinematics.

Role of reference ``src/jaxsim/rbda/collidable_points.py:9-65``: positions and
mixed-representation linear velocities of the enabled collision points, one
batched expression over points (reads FK results, no extra sweep).
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp


def collidable_points_pos_vel(
    kdp,
    *,
    link_transforms: jtp.Array,
    link_velocities_inertial: jtp.Array,
) -> tuple[jtp.Array, jtp.Array]:
    """Compute ``(W_p_C (nC,3), W_ṗ_C (nC,3))`` for the enabled points.

    Args:
        link_transforms: ``(nL, 4, 4)`` world link poses (from FK).
        link_velocities_inertial: ``(nL, 6)`` inertial-fixed link velocities.
    """
    idx = kdp.contact_parameters.indices_of_enabled_collidable_points
    parents = jnp.array(
        [kdp.contact_parameters.body[i] for i in idx], dtype=int
    )
    L_p_C = kdp.contact_parameters.point[jnp.array(idx, dtype=int)]

    W_H_L = jnp.asarray(link_transforms)[parents]  # (nC, 4, 4)
    W_v_WL = jnp.asarray(link_velocities_inertial)[parents]  # (nC, 6)

    W_p_C = (
        jnp.einsum("cij,cj->ci", W_H_L[:, :3, :3], L_p_C) + W_H_L[:, :3, 3]
    )

    # Mixed linear velocity: ẋ_p = v_lin + ω × p  for inertial-fixed (v, ω).
    v_lin, omega = W_v_WL[:, 0:3], W_v_WL[:, 3:6]
    W_pd_C = v_lin + jnp.cross(omega, W_p_C)

    return W_p_C, W_pd_C
