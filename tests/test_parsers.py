"""Parser robustness tests: SDF pose semantics, URDF edge cases
(reference ``parsers/rod/parser.py`` behaviors)."""

import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.parsers import build_model_description
from jaxsim_tpu.parsers.kinematic_graph import KinematicGraphTransforms
from tests.conftest import assert_allclose


def test_sdf_relative_to_chain():
    """Link poses given relative to other links resolve through the chain."""
    sdf = """<sdf version="1.8"><model name="chain">
      <link name="a"><pose>1 0 0 0 0 0</pose>
        <inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
      <link name="b"><pose relative_to="a">0 2 0 0 0 0</pose>
        <inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
      <joint name="j" type="revolute"><parent>a</parent><child>b</child>
        <axis><xyz>0 0 1</xyz></axis></joint>
    </model></sdf>"""
    d = build_model_description(sdf)
    fk = KinematicGraphTransforms(graph=d)
    assert_allclose(fk.transform("a")[:3, 3], np.array([1.0, 0, 0]), atol=1e-6)
    assert_allclose(fk.transform("b")[:3, 3], np.array([1.0, 2, 0]), atol=1e-6)


def test_sdf_joint_pose_relative_to_joint():
    """A joint's pose can reference another joint frame."""
    sdf = """<sdf version="1.8"><model name="jj">
      <link name="a"><inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
      <link name="b"><pose>0 0 1 0 0 0</pose>
        <inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
      <link name="c"><pose>0 0 2 0 0 0</pose>
        <inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
      <joint name="j1" type="revolute"><parent>a</parent><child>b</child>
        <axis><xyz>0 1 0</xyz></axis></joint>
      <joint name="j2" type="revolute"><pose relative_to="j1">0 0 1 0 0 0</pose>
        <parent>b</parent><child>c</child><axis><xyz>0 1 0</xyz></axis></joint>
    </model></sdf>"""
    d = build_model_description(sdf)
    fk = KinematicGraphTransforms(graph=d)
    # j1 sits at b (z=1); j2 at j1 + (0,0,1) = z=2 = at c.
    assert_allclose(fk.transform("c")[:3, 3], np.array([0.0, 0, 2]), atol=1e-6)


def test_sdf_static_model_is_fixed_base():
    sdf = """<sdf version="1.7"><model name="s"><static>true</static>
      <link name="l"><inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
    </model></sdf>"""
    d = build_model_description(sdf)
    assert d.fixed_base


def test_sdf_axis_expressed_in_model_frame():
    """``expressed_in="__model__"`` rotates the axis into the joint frame."""
    import math

    # Child link (and thus the joint frame) rotated 90° about z; a +x axis
    # expressed in the model frame becomes -y... +x_model = R_z(-90)... in
    # joint coords: R_jm @ x = (cos,-sin) → (0,-1,0).
    sdf = f"""<sdf version="1.8"><model name="ax">
      <link name="a"><inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
      <link name="b"><pose>0 0 1 0 0 {math.pi / 2}</pose>
        <inertial><mass>1</mass><inertia><ixx>.1</ixx><iyy>.1</iyy><izz>.1</izz></inertia></inertial></link>
      <joint name="j" type="revolute"><parent>a</parent><child>b</child>
        <axis><xyz expressed_in="__model__">1 0 0</xyz></axis></joint>
    </model></sdf>"""
    d = build_model_description(sdf)
    axis = d.joints[0].axis
    assert_allclose(axis, np.array([0.0, -1.0, 0.0]), atol=1e-6)


def test_sdf_matches_equivalent_urdf():
    """An SDF written in URDF conventions produces identical dynamics."""
    urdf = models.build_pendulum_urdf(2)
    sdf = """<sdf version="1.8"><model name="dp">
      <link name="base"><inertial><mass>1</mass>
        <inertia><ixx>0.001667</ixx><iyy>0.001667</iyy><izz>0.001667</izz></inertia></inertial></link>
      <link name="link1"><inertial><pose>0 0 -0.5 0 0 0</pose><mass>1</mass>
        <inertia><ixx>0.0834333</ixx><iyy>0.0834333</iyy><izz>0.0002</izz></inertia></inertial></link>
      <link name="link2"><pose>0 0 -1 0 0 0</pose>
        <inertial><pose>0 0 -0.5 0 0 0</pose><mass>1</mass>
        <inertia><ixx>0.0834333</ixx><iyy>0.0834333</iyy><izz>0.0002</izz></inertia></inertial></link>
      <joint name="joint1" type="revolute"><pose relative_to="link1"/>
        <parent>base</parent><child>link1</child>
        <axis><xyz>0 1 0</xyz><limit><lower>-6.28</lower><upper>6.28</upper></limit></axis></joint>
      <joint name="joint2" type="revolute"><pose relative_to="link2"/>
        <parent>link1</parent><child>link2</child>
        <axis><xyz>0 1 0</xyz><limit><lower>-6.28</lower><upper>6.28</upper></limit></axis></joint>
    </model></sdf>"""

    m_urdf = js.JaxSimModel.build_from_model_description(urdf)
    m_sdf = js.JaxSimModel.build_from_model_description(sdf)

    from jaxsim_tpu import ops

    s = jnp.array([0.4, -0.7])
    M1 = ops.crba(m_urdf.kin_dyn_parameters, joint_positions=s)
    M2 = ops.crba(m_sdf.kin_dyn_parameters, joint_positions=s)
    # URDF model is fixed-base via world link; compare joint blocks.
    assert_allclose(np.asarray(M1)[6:, 6:], np.asarray(M2)[6:, 6:], rtol=1e-3, atol=1e-4)


def test_urdf_continuous_joint():
    urdf = models.build_pendulum_urdf(1).replace('type="revolute"', 'type="continuous"')
    d = build_model_description(urdf)
    assert len(d.joints) == 1
    lo, hi = d.joints[0].position_limit
    assert not np.isfinite(lo) and not np.isfinite(hi)


def test_urdf_unconnected_link_dropped():
    urdf = models.build_pendulum_urdf(1).replace(
        "</robot>",
        '<link name="orphan"><inertial><mass value="1"/>'
        '<inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial></link></robot>',
    )
    d = build_model_description(urdf)
    assert "orphan" not in d.link_names()


def test_collision_env_vars():
    import os

    os.environ["JAXSIM_COLLISION_SPHERE_POINTS"] = "10"
    try:
        d = build_model_description(models.build_sphere_urdf())
        assert len(d.all_enabled_collidable_points()) == 10
    finally:
        del os.environ["JAXSIM_COLLISION_SPHERE_POINTS"]

    os.environ["JAXSIM_COLLISION_USE_BOTTOM_ONLY"] = "1"
    try:
        d = build_model_description(models.build_box_urdf())
        assert len(d.all_enabled_collidable_points()) == 4
    finally:
        del os.environ["JAXSIM_COLLISION_USE_BOTTOM_ONLY"]


def test_disable_collision_points():
    d = build_model_description(models.build_box_urdf())
    d.update_collision_shape_of_link("box_link", enabled=False)
    assert len(d.all_enabled_collidable_points()) == 0


# ----- vendored real-robot package (mesh pipeline end-to-end) -----

# Masses of the generated links (tests/assets/generate_vendor_arm.py LINKS).
_VENDOR_ARM_LINK_MASSES = [
    ("base_link", "cyl", (0.090, 0.12), 8.0),
    ("shoulder_link", "cyl", (0.080, 0.18), 7.8),
    ("upper_arm_link", "cyl", (0.070, 0.61), 12.9),
    ("forearm_link", "cyl", (0.055, 0.57), 3.9),
    ("wrist_1_link", "cyl", (0.045, 0.12), 1.96),
    ("wrist_2_link", "cyl", (0.045, 0.12), 1.96),
    ("wrist_3_link", "box", (0.060, 0.09), 0.2),
]


def test_vendor_arm_end_to_end(monkeypatch):
    """Parse the vendored UR10-class arm package (URDF + binary STL meshes
    via package:// URIs), with mesh collisions enabled: the full
    parse → build → reduce → dynamics pipeline runs on a vendor-layout
    robot (reference zoo analog, ``tests/conftest.py:207-350``)."""
    import pathlib

    import jax
    import jax.numpy as jnp

    import jaxsim_tpu.api as js

    monkeypatch.setenv("JAXSIM_COLLISION_MESH_ENABLED", "1")
    urdf = (
        pathlib.Path(__file__).parent
        / "assets"
        / "vendor_arm"
        / "urdf"
        / "vendor_arm.urdf"
    )
    model = js.JaxSimModel.build_from_model_description(urdf)

    assert model.fixed_base()
    assert model.number_of_joints() == 6
    # 3-deep fixed chain wrist_3 -> ee_bracket -> flange -> tool0: the
    # massive bracket LUMPS into wrist_3 and all three become frames.
    assert "ee_bracket" in model.frame_names()
    assert "flange" in model.frame_names()
    assert "tool0" in model.frame_names()
    assert "ee_bracket" not in model.link_names()
    # Total mass includes the lumped 0.35 kg bracket.
    total = sum(m for _, _, _, m in _VENDOR_ARM_LINK_MASSES) + 0.35
    assert float(js.model.total_mass(model)) == pytest.approx(total, rel=1e-6)
    # Mesh collision points extracted from the STL vertices.
    n_points = len(
        model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points
    )
    assert n_points > 100  # 6 cylinders × 48 rim vertices + box corners
    # Mesh `scale` attribute: the bracket STL is authored in MILLIMETERS
    # with scale="0.001 ...": all collision points must be meter-scale
    # (ignoring the scale would put bracket points ~80 "meters" out).
    pts = np.asarray(model.kin_dyn_parameters.contact_parameters.point)
    assert np.all(np.isfinite(pts)) and float(np.abs(pts).max()) < 1.0

    # Non-convex mesh: the L-bracket's inner-corner vertices lie strictly
    # INSIDE their convex hull, so vertex extraction preserves geometry a
    # hull-based strategy would erase.
    from scipy.spatial import ConvexHull

    from jaxsim_tpu.parsers import mesh_io, meshes

    verts = np.unique(
        mesh_io.load_mesh_vertices(
            urdf.parent.parent / "meshes" / "ee_bracket.stl"
        ),
        axis=0,
    )
    extracted = meshes.VertexExtraction()(verts)
    hull_idx = set(ConvexHull(verts).vertices.tolist())
    interior = [i for i in range(len(verts)) if i not in hull_idx]
    assert len(interior) > 0, "bracket unexpectedly convex"
    assert len(extracted) == len(verts) > len(hull_idx)

    # tool0 pose at zero configuration is finite and below the full reach.
    data = js.JaxSimModelData.build(model)
    H_tool = js.frame.transform(
        model, data, frame_index=js.frame.name_to_idx(model, frame_name="tool0")
    )
    assert np.all(np.isfinite(np.asarray(H_tool)))
    assert float(jnp.linalg.norm(H_tool[:3, 3])) < 2.0

    # Reduction to a 3-DoF shoulder/elbow arm preserves total mass.
    reduced = js.model.reduce(
        model, considered_joints=("joint_1", "joint_2", "joint_3")
    )
    assert reduced.number_of_joints() == 3
    assert float(js.model.total_mass(reduced)) == pytest.approx(
        float(js.model.total_mass(model)), rel=1e-6
    )

    # FD ∘ ID identity on the mesh-built model.
    d = js.JaxSimModelData.build(
        model,
        joint_positions=jnp.array([0.3, -0.7, 1.1, -0.4, 0.6, 0.2]),
        joint_velocities=0.1 * jnp.ones(6),
    )
    tau = jnp.array([1.0, -2.0, 0.5, 0.2, -0.1, 0.05])
    _, sdd = js.model.forward_dynamics_aba(model, d, joint_forces=tau)
    _, tau_back = js.model.inverse_dynamics(model, d, joint_accelerations=sdd)
    np.testing.assert_allclose(
        np.asarray(tau_back), np.asarray(tau), rtol=1e-3, atol=1e-3
    )
