"""Differential tests against MuJoCo as an independent physics oracle.

The reference validates against iDynTree (``tests/utils.py:135-509``); that
package is unavailable here, so MuJoCo (which parses URDF natively) plays the
same role for fixed-base models: mass matrix, bias forces, gravity torques,
and forward dynamics must agree.
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from jaxsim_tpu import models, ops
from jaxsim_tpu.api.kin_dyn_parameters import KinDynParameters
from jaxsim_tpu.parsers import build_model_description
from tests.conftest import assert_allclose


@pytest.fixture(
    scope="module",
    params=["pendulum", "cartpole", "arm"],
)
def fixed_base_pair(request):
    urdf = {
        "pendulum": models.build_pendulum_urdf(2),
        "cartpole": models.build_cartpole_urdf(),
        "arm": models.build_arm_urdf(),
    }[request.param]
    desc = build_model_description(urdf)
    kdp = KinDynParameters.build(desc)
    mj_model = mujoco.MjModel.from_xml_string(urdf)
    return kdp, desc, mj_model


def mj_joint_order(mj_model):
    return [
        mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_JOINT, j)
        for j in range(mj_model.njnt)
    ]


def reorder(kdp, mj_model):
    """Map our joint index -> mujoco qpos index."""
    ours = list(kdp.joint_model.joint_names[1:])
    theirs = mj_joint_order(mj_model)
    return np.array([theirs.index(name) for name in ours])


def test_mass_matrix_vs_mujoco(fixed_base_pair, prng_key):
    kdp, desc, mj_model = fixed_base_pair
    import jax

    n = kdp.number_of_joints()
    s = np.asarray(0.5 * jax.random.normal(prng_key, (n,)), dtype=float)

    perm = reorder(kdp, mj_model)
    data = mujoco.MjData(mj_model)
    data.qpos[perm] = s
    mujoco.mj_forward(mj_model, data)
    M_mj_full = np.zeros((mj_model.nv, mj_model.nv))
    mujoco.mj_fullM(mj_model, data, M_mj_full)
    M_mj = M_mj_full[np.ix_(perm, perm)]

    M_ours = np.asarray(ops.crba(kdp, joint_positions=jnp.array(s)))[6:, 6:]
    assert_allclose(M_ours, M_mj, rtol=1e-4, atol=1e-5)


def test_bias_forces_vs_mujoco(fixed_base_pair, prng_key):
    kdp, desc, mj_model = fixed_base_pair
    import jax

    n = kdp.number_of_joints()
    k1, k2 = jax.random.split(prng_key)
    s = np.asarray(0.5 * jax.random.normal(k1, (n,)), dtype=float)
    sd = np.asarray(jax.random.normal(k2, (n,)), dtype=float)

    perm = reorder(kdp, mj_model)
    data = mujoco.MjData(mj_model)
    data.qpos[perm] = s
    data.qvel[perm] = sd
    mujoco.mj_forward(mj_model, data)
    h_mj = np.array(data.qfrc_bias)[perm]

    _, h_ours = ops.rnea(
        kdp,
        base_transform=jnp.eye(4),
        joint_positions=jnp.array(s),
        base_velocity_inertial=jnp.zeros(6),
        joint_velocities=jnp.array(sd),
        floating_base=False,
    )
    assert_allclose(h_ours, h_mj, rtol=1e-3, atol=1e-4)


def test_forward_dynamics_vs_mujoco(fixed_base_pair, prng_key):
    kdp, desc, mj_model = fixed_base_pair
    import jax

    n = kdp.number_of_joints()
    k1, k2, k3 = jax.random.split(prng_key, 3)
    s = np.asarray(0.5 * jax.random.normal(k1, (n,)), dtype=float)
    sd = np.asarray(jax.random.normal(k2, (n,)), dtype=float)
    tau = np.asarray(jax.random.normal(k3, (n,)), dtype=float)

    perm = reorder(kdp, mj_model)
    # Disable damping/friction for a pure rigid-body comparison.
    mj_model.dof_damping[:] = 0.0
    mj_model.dof_frictionloss[:] = 0.0

    data = mujoco.MjData(mj_model)
    data.qpos[perm] = s
    data.qvel[perm] = sd
    data.qfrc_applied[perm] = tau
    mujoco.mj_forward(mj_model, data)
    qacc_mj = np.array(data.qacc)[perm]

    _, sdd = ops.aba(
        kdp,
        base_transform=jnp.eye(4),
        joint_positions=jnp.array(s),
        base_velocity_inertial=jnp.zeros(6),
        joint_velocities=jnp.array(sd),
        joint_forces=jnp.array(tau),
        floating_base=False,
    )
    assert_allclose(sdd, qacc_mj, rtol=2e-3, atol=2e-3)
