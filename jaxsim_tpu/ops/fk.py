"""Forward kinematics: world transforms + inertial 6D velocities of all links.

Role of reference ``src/jaxsim/rbda/forward_kinematics.py:12-113`` — one
forward sweep over the kinematic tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint

from .common import mv


def forward_kinematics_model(
    kdp,
    *,
    base_transform: jtp.MatrixLike,
    joint_positions: jtp.VectorLike,
    base_velocity_inertial: jtp.VectorLike,
    joint_velocities: jtp.VectorLike,
) -> tuple[jtp.Array, jtp.Array]:
    """Compute ``(W_H_L (nL,4,4), W_v_WL (nL,6))``.

    Velocities are inertial-fixed (left-trivialized) 6D link velocities.
    """
    s = jnp.asarray(joint_positions, dtype=float)
    sd = jnp.asarray(joint_velocities, dtype=float)
    W_H_B = jnp.asarray(base_transform, dtype=float)
    W_v_WB = jnp.asarray(base_velocity_inertial, dtype=float)

    n_links = kdp.number_of_links()
    lam = kdp.parent_array
    S = kdp.motion_subspaces

    i_X_li = kdp.joint_transforms(joint_positions=s, base_transform=W_H_B)

    # W_X_i stacked transforms world→link; row 0 from the base row of i_X_λ.
    W_X_i = jnp.zeros((n_links, 6, 6)).at[0].set(Adjoint.inverse(i_X_li[0]))
    W_v_Wi = jnp.zeros((n_links, 6)).at[0].set(W_v_WB)

    def propagate(carry, i):
        W_X_i, W_v_Wi = carry
        li_X_i = Adjoint.inverse(i_X_li[i])
        W_Xi = W_X_i[lam[i]] @ li_X_i
        W_X_i = W_X_i.at[i].set(W_Xi)
        W_vi = W_v_Wi[lam[i]] + mv(W_Xi, S[i] * sd[i - 1])
        W_v_Wi = W_v_Wi.at[i].set(W_vi)
        return (W_X_i, W_v_Wi), None

    if n_links > 1:
        (W_X_i, W_v_Wi), _ = jax.lax.scan(
            propagate, (W_X_i, W_v_Wi), jnp.arange(1, n_links)
        )

    return Adjoint.to_transform(W_X_i), W_v_Wi
