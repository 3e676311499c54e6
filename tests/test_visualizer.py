"""Visualization smoke tests (reference ``tests/test_visualizer.py:22-56``)."""

import mujoco
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.mujoco import (
    ModelToMjcf,
    MujocoModelHelper,
    MujocoVideoRecorder,
    mujoco_data_from_jaxsim,
)


def test_urdf_to_mjcf_fixed_base():
    mjcf = ModelToMjcf.convert(models.build_pendulum_urdf(2))
    model = mujoco.MjModel.from_xml_string(mjcf)
    helper = MujocoModelHelper(model)
    assert not helper.is_floating_base()
    assert "joint1" in helper.joint_names()


def test_urdf_to_mjcf_floating_base():
    mjcf = ModelToMjcf.convert(models.build_humanoid_urdf())
    model = mujoco.MjModel.from_xml_string(mjcf)
    helper = MujocoModelHelper(model)
    assert helper.is_floating_base()
    helper.set_base_position(np.array([0.0, 0.0, 1.0]))
    helper.set_joint_position("l_knee", -0.5)
    helper.forward()
    assert helper.joint_position("l_knee") == pytest.approx(-0.5)


def test_model_helper_introspection():
    """Body/geometry/orientation accessors of MujocoModelHelper
    (reference ``mujoco/model.py:174-404``)."""
    mjcf = ModelToMjcf.convert(models.build_humanoid_urdf())
    model = mujoco.MjModel.from_xml_string(mjcf)
    helper = MujocoModelHelper(model)

    assert not helper.is_fixed_base()
    assert helper.base_link() in helper.body_names()
    assert helper.number_of_bodies() == model.nbody
    assert helper.number_of_geometries() == model.ngeom
    assert helper.joint_dofs("l_knee") == 1

    helper.set_base_position(np.array([0.1, 0.2, 0.9]))
    helper.set_base_orientation(np.array([1.0, 0.0, 0.0, 0.0]))
    helper.forward()

    R = helper.base_orientation(dcm=True)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    body = helper.base_link()
    np.testing.assert_allclose(
        helper.body_position(body), [0.1, 0.2, 0.9], atol=1e-12
    )
    Rb = helper.body_orientation(body, dcm=True)
    qb = helper.body_orientation(body)
    np.testing.assert_allclose(Rb, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(qb, [1, 0, 0, 0], atol=1e-12)

    gname = next(n for n in helper.geometry_names() if n)
    gpos = helper.geometry_position(gname)
    assert gpos.shape == (3,)
    Rg = helper.geometry_orientation(gname, dcm=True)
    qg = helper.geometry_orientation(gname)
    np.testing.assert_allclose(Rg @ Rg.T, np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.linalg.norm(qg), 1.0, atol=1e-7)


def test_sdf_to_mjcf():
    sdf = """<sdf version="1.7"><model name="sdfbox">
      <link name="b"><inertial><mass>1</mass>
      <inertia><ixx>0.1</ixx><iyy>0.1</iyy><izz>0.1</izz></inertia></inertial>
      </link></model></sdf>"""
    mjcf = ModelToMjcf.convert(sdf)
    mujoco.MjModel.from_xml_string(mjcf)


def test_inclined_plane():
    mjcf = ModelToMjcf.convert(
        models.build_box_urdf(), plane_normal=(0.1, 0.0, 1.0)
    )
    mujoco.MjModel.from_xml_string(mjcf)


def test_data_bridge_and_render():
    """JaxSim state → MjData → offline frame render."""
    import jax.numpy as jnp

    urdf = models.build_humanoid_urdf()
    model = js.JaxSimModel.build_from_model_description(urdf)
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.9]),
        joint_positions=0.1 * jnp.ones(23),
    )

    mjcf = ModelToMjcf.convert(urdf)
    mj_model = mujoco.MjModel.from_xml_string(mjcf)
    mj_data = mujoco_data_from_jaxsim(mj_model, model, data)
    assert mj_data.qpos[2] == pytest.approx(0.9)

    recorder = MujocoVideoRecorder(mj_model, mj_data, width=64, height=48)
    frame = recorder.render_frame()
    assert frame.shape == (48, 64, 3)


def test_data_bridge_reduced_model_locked_joints():
    """Replaying a REDUCED model in the FULL-model MJCF restores the locked
    joints to their locked positions (reference ``mujoco/utils.py:40-105``)."""
    import jax.numpy as jnp

    urdf = models.build_humanoid_urdf()
    full = js.JaxSimModel.build_from_model_description(urdf)
    considered = tuple(n for n in full.joint_names() if n != "l_knee")
    reduced = js.model.reduce(
        full, considered_joints=considered, locked_joint_positions={"l_knee": -0.7}
    )
    data = js.JaxSimModelData.build(
        reduced, base_position=jnp.array([0.0, 0.0, 0.9])
    )

    mj_model = mujoco.MjModel.from_xml_string(ModelToMjcf.convert(urdf))
    mj_data = mujoco_data_from_jaxsim(mj_model, reduced, data)
    helper = MujocoModelHelper(mj_model, mj_data)
    assert helper.joint_position("l_knee") == pytest.approx(-0.7)

    # Opting out leaves the locked joint at its MJCF default (0).
    mj_data0 = mujoco_data_from_jaxsim(
        mj_model, reduced, data, update_removed_joints=False
    )
    helper0 = MujocoModelHelper(mj_model, mj_data0)
    assert helper0.joint_position("l_knee") == pytest.approx(0.0)
