"""Forward kinematics: world transforms + inertial 6D velocities of all links.

Role of reference ``src/jaxsim/rbda/forward_kinematics.py:12-113`` — one
forward sweep over the kinematic tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu import exceptions
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
    # Runtime validation (CPU opt-in): mirrors the reference's
    # process_inputs quaternion checks (rbda/utils.py:136-146).
    exceptions.validate_base_transform(W_H_B)
    W_v_WB = jnp.asarray(base_velocity_inertial, dtype=float)

    n_links = kdp.number_of_links()
    lam = tuple(int(x) for x in kdp.parent_array_static)
    S = kdp.motion_subspaces

    i_X_li = kdp.joint_transforms(joint_positions=s, base_transform=W_H_B)

    # Unrolled over the static parent array (no scan carry of (nL, 6, 6)
    # buffers — see ops/aba.py for the rationale).
    W_X_i = [Adjoint.inverse(i_X_li[0])] + [None] * (n_links - 1)
    W_v_Wi = [W_v_WB] + [None] * (n_links - 1)

    for i in range(1, n_links):
        li_X_i = Adjoint.inverse(i_X_li[i])
        W_X_i[i] = W_X_i[lam[i]] @ li_X_i
        W_v_Wi[i] = W_v_Wi[lam[i]] + mv(W_X_i[i], S[i] * sd[i - 1])

    return (
        Adjoint.to_transform(jnp.stack(W_X_i)),
        jnp.stack(W_v_Wi),
    )
