#!/usr/bin/env python
"""Generate the vendored ``vendor_arm`` robot: a UR10-class 6-DoF arm whose
links reference binary STL collision/visual meshes via ``package://`` URIs —
the asset layout real vendor description packages use
(``<pkg>/urdf/model.urdf`` + ``<pkg>/meshes/*.stl``).

Run once from the repo root to (re)generate ``tests/assets/vendor_arm/``;
the output is committed so tests never regenerate it. The arm exercises the
parser/mesh pipeline the way the reference's robot_descriptions zoo does
(``/root/reference/tests/conftest.py:207-350``): mesh collision point
extraction (``JAXSIM_COLLISION_MESH_ENABLED``), non-axis-aligned joint
origins with rpy, a deep fixed-joint chain (flange → tool0), and
mesh-consistent inertias.
"""

from __future__ import annotations

import pathlib
import struct

import numpy as np

ROOT = pathlib.Path(__file__).parent / "vendor_arm"


def cylinder_mesh(radius: float, length: float, n: int = 24) -> np.ndarray:
    """Closed cylinder along +z starting at z=0, as (n_tri, 3, 3)."""
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    lo = np.stack([radius * np.cos(a), radius * np.sin(a), np.zeros(n)], axis=1)
    hi = lo + np.array([0.0, 0.0, length])
    tris = []
    for i in range(n):
        j = (i + 1) % n
        tris.append([lo[i], lo[j], hi[i]])
        tris.append([lo[j], hi[j], hi[i]])
        tris.append([[0, 0, 0], lo[j], lo[i]])
        tris.append([[0, 0, length], hi[i], hi[j]])
    return np.asarray(tris, dtype=np.float32)


def capped_box_mesh(x: float, y: float, z: float) -> np.ndarray:
    """Axis-aligned box centred in x/y, spanning [0, z], as triangles."""
    xs, ys = x / 2, y / 2
    v = np.array(
        [
            [-xs, -ys, 0], [xs, -ys, 0], [xs, ys, 0], [-xs, ys, 0],
            [-xs, -ys, z], [xs, -ys, z], [xs, ys, z], [-xs, ys, z],
        ],
        dtype=np.float32,
    )
    quads = [
        (0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1),
        (1, 5, 6, 2), (2, 6, 7, 3), (3, 7, 4, 0),
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append([v[a], v[b], v[c]])
        tris.append([v[a], v[c], v[d]])
    return np.asarray(tris, dtype=np.float32)


def l_bracket_mesh_mm(
    leg: float = 80.0, width: float = 40.0, thick: float = 16.0
) -> np.ndarray:
    """Non-convex L-bracket in MILLIMETER units (exercises the URDF mesh
    ``scale`` attribute): a horizontal plate spanning [0, leg]x[0, width]x
    [0, thick] plus a vertical plate spanning [0, thick]x[0, width]x
    [0, leg]. The inner-corner vertices at (thick, *, thick) are NOT on
    the convex hull, so hull-based point extraction must differ from
    vertex extraction."""

    def box(x0, x1, y0, y1, z0, z1):
        v = np.array(
            [
                [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
                [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
            ],
            dtype=np.float32,
        )
        quads = [
            (0, 1, 2, 3), (4, 7, 6, 5), (0, 4, 5, 1),
            (1, 5, 6, 2), (2, 6, 7, 3), (3, 7, 4, 0),
        ]
        tris = []
        for a, b, c, d in quads:
            tris.append([v[a], v[b], v[c]])
            tris.append([v[a], v[c], v[d]])
        return tris

    tris = box(0, leg, 0, width, 0, thick) + box(0, thick, 0, width, thick, leg)
    return np.asarray(tris, dtype=np.float32)


def write_binary_stl(path: pathlib.Path, tris: np.ndarray) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    n_tri = len(tris)
    with open(path, "wb") as f:
        f.write(b"vendor_arm generated mesh".ljust(80, b"\0"))
        f.write(struct.pack("<I", n_tri))
        for t in tris:
            n = np.cross(t[1] - t[0], t[2] - t[0])
            norm = np.linalg.norm(n)
            n = n / norm if norm > 0 else n
            f.write(struct.pack("<3f", *n.astype(float)))
            for vert in t:
                f.write(struct.pack("<3f", *vert.astype(float)))
            f.write(struct.pack("<H", 0))


def cylinder_inertia(mass: float, radius: float, length: float) -> dict:
    # About the CoM (mid-height) of a z-aligned solid cylinder.
    ixx = iyy = mass * (3 * radius**2 + length**2) / 12.0
    izz = mass * radius**2 / 2.0
    return dict(ixx=ixx, iyy=iyy, izz=izz)


LINKS = [
    # name, mesh builder, (radius/x, length), mass, mesh kind
    ("base_link", "cyl", (0.090, 0.12), 8.0),
    ("shoulder_link", "cyl", (0.080, 0.18), 7.8),
    ("upper_arm_link", "cyl", (0.070, 0.61), 12.9),
    ("forearm_link", "cyl", (0.055, 0.57), 3.9),
    ("wrist_1_link", "cyl", (0.045, 0.12), 1.96),
    ("wrist_2_link", "cyl", (0.045, 0.12), 1.96),
    ("wrist_3_link", "box", (0.060, 0.09), 0.2),
]

# (child link, origin xyz, origin rpy, axis)
JOINTS = [
    ("shoulder_link", (0, 0, 0.1273), (0, 0, 0), (0, 0, 1)),
    ("upper_arm_link", (0, 0.220941, 0), (0, 1.570796325, 0), (0, 1, 0)),
    ("forearm_link", (0, -0.1719, 0.612), (0, 0, 0), (0, 1, 0)),
    ("wrist_1_link", (0, 0, 0.5723), (0, 1.570796325, 0), (0, 1, 0)),
    ("wrist_2_link", (0, 0.1149, 0), (0, 0, 0), (0, 0, 1)),
    ("wrist_3_link", (0, 0, 0.1157), (0, 0, 0), (0, 1, 0)),
]


def main() -> None:
    mesh_dir = ROOT / "meshes"
    link_xml = []
    for name, kind, (r, ln), mass in LINKS:
        tris = (
            cylinder_mesh(r, ln)
            if kind == "cyl"
            else capped_box_mesh(r, r, ln)
        )
        write_binary_stl(mesh_dir / f"{name}.stl", tris)
        inertia = cylinder_inertia(mass, r, ln)
        link_xml.append(
            f"""
  <link name="{name}">
    <inertial>
      <origin xyz="0 0 {ln / 2}" rpy="0 0 0"/>
      <mass value="{mass}"/>
      <inertia ixx="{inertia['ixx']:.6g}" ixy="0" ixz="0"
               iyy="{inertia['iyy']:.6g}" iyz="0" izz="{inertia['izz']:.6g}"/>
    </inertial>
    <visual>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry><mesh filename="package://vendor_arm/meshes/{name}.stl"/></geometry>
    </visual>
    <collision>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry><mesh filename="package://vendor_arm/meshes/{name}.stl"/></geometry>
    </collision>
  </link>"""
        )

    joint_xml = [
        """
  <link name="world"/>
  <joint name="world_to_base" type="fixed">
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <parent link="world"/>
    <child link="base_link"/>
  </joint>"""
    ]
    parent = "base_link"
    for i, (child, xyz, rpy, axis) in enumerate(JOINTS):
        joint_xml.append(
            f"""
  <joint name="joint_{i + 1}" type="revolute">
    <origin xyz="{xyz[0]} {xyz[1]} {xyz[2]}" rpy="{rpy[0]} {rpy[1]} {rpy[2]}"/>
    <parent link="{parent}"/>
    <child link="{child}"/>
    <axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>
    <limit lower="-6.28" upper="6.28" effort="330" velocity="2.16"/>
    <dynamics damping="0.5" friction="0"/>
  </joint>"""
        )
        parent = child

    # End-effector L-bracket: a NON-CONVEX mesh authored in MILLIMETERS
    # and scaled to meters via the URDF mesh `scale` attribute (the two
    # real-world messy-asset conventions the robot_descriptions zoo
    # stresses), attached by a fixed joint so it lumps into wrist_3 on
    # reduction. Inertia of the 0.08x0.04x0.016 m horizontal leg only
    # (deliberately "vendor sloppy": real packages ship approximations).
    write_binary_stl(mesh_dir / "ee_bracket.stl", l_bracket_mesh_mm())
    link_xml.append(
        """
  <link name="ee_bracket">
    <inertial>
      <origin xyz="0.04 0.02 0.008" rpy="0 0 0"/>
      <mass value="0.35"/>
      <inertia ixx="6.2e-05" ixy="0" ixz="0"
               iyy="0.0002" iyz="0" izz="0.00024"/>
    </inertial>
    <visual>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry><mesh filename="package://vendor_arm/meshes/ee_bracket.stl" scale="0.001 0.001 0.001"/></geometry>
    </visual>
    <collision>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry><mesh filename="package://vendor_arm/meshes/ee_bracket.stl" scale="0.001 0.001 0.001"/></geometry>
    </collision>
  </link>"""
    )

    # Deep fixed chain (3 fixed joints): wrist_3 -> ee_bracket (massive,
    # must LUMP into wrist_3 on reduction) -> flange -> tool0 (massless
    # vendor frames).
    joint_xml.append(
        """
  <joint name="wrist_3__ee_bracket" type="fixed">
    <origin xyz="0 0 0.0922" rpy="0 -1.570796325 0"/>
    <parent link="wrist_3_link"/>
    <child link="ee_bracket"/>
  </joint>
  <link name="flange"/>
  <joint name="ee_bracket__flange" type="fixed">
    <origin xyz="0.08 0.02 0.008" rpy="0 0 0"/>
    <parent link="ee_bracket"/>
    <child link="flange"/>
  </joint>
  <link name="tool0"/>
  <joint name="flange__tool0" type="fixed">
    <origin xyz="0 0 0" rpy="1.570796325 0 0"/>
    <parent link="flange"/>
    <child link="tool0"/>
  </joint>"""
    )

    urdf = (
        '<?xml version="1.0"?>\n<robot name="vendor_arm">'
        + "".join(link_xml)
        + "".join(joint_xml)
        + "\n</robot>\n"
    )
    urdf_path = ROOT / "urdf" / "vendor_arm.urdf"
    urdf_path.parent.mkdir(parents=True, exist_ok=True)
    urdf_path.write_text(urdf)
    print(f"wrote {urdf_path} and {len(LINKS)} meshes under {mesh_dir}")


if __name__ == "__main__":
    main()
