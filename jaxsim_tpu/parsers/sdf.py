"""SDF parser (pure stdlib XML — the environment has no ``rod``/libsdformat).

Supports the common SDF 1.7+ subset: model/link/joint/frame elements with
``<pose>`` chains (link poses relative to the model frame, joint poses
relative to the child link, per SDF defaults, plus explicit ``relative_to``
between those frames), static models, world-attached fixed joints.

Everything is converted to the URDF frame convention used by the rest of the
pipeline (see :mod:`jaxsim_tpu.parsers.urdf`), mirroring what the reference
does through ``rod`` (``src/jaxsim/parsers/rod/parser.py:84``):

* ``joint.pose`` = parentlink_H_joint;
* child ``link.pose`` = joint_H_childlink;
* root ``link.pose`` = model_H_root.
"""

from __future__ import annotations

import os
import pathlib
import xml.etree.ElementTree as ET

import numpy as np
import numpy.typing as npt

from jaxsim_tpu import logging

from . import collision_utils
from .descriptions.collision import CollisionShape
from .descriptions.joint import JointDescription, JointType
from .descriptions.link import LinkDescription
from .kinematic_graph import RootPose
from .urdf import _matrix_to_wxyz, _rpy_to_matrix

_JOINT_TYPES = {
    "fixed": JointType.Fixed,
    "revolute": JointType.Revolute,
    "continuous": JointType.Revolute,
    "prismatic": JointType.Prismatic,
}


def _pose_to_matrix(element: ET.Element | None) -> npt.NDArray:
    H = np.eye(4)
    if element is None or element.text is None:
        return H
    vals = np.fromstring(element.text.strip(), sep=" ")
    if vals.size != 6:
        raise ValueError(f"Invalid <pose>: '{element.text}'")
    H[:3, :3] = _rpy_to_matrix(vals[3:6])
    H[:3, 3] = vals[0:3]
    return H


def _inv(H: npt.NDArray) -> npt.NDArray:
    R, p = H[:3, :3], H[:3, 3]
    out = np.eye(4)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ p
    return out


def parse_sdf(
    sdf: str | pathlib.Path,
    model_name: str | None = None,
):
    """Parse an SDF string/path. Returns the same tuple as
    :func:`jaxsim_tpu.parsers.urdf.parse_urdf`."""
    from jaxsim_tpu.math import np_spatial

    text = sdf
    if isinstance(sdf, pathlib.Path) or (
        isinstance(sdf, str) and len(sdf) < 4096 and os.path.exists(sdf)
    ):
        text = pathlib.Path(sdf).read_text()

    root = ET.fromstring(text)
    if root.tag == "sdf":
        models = root.findall("model") + [
            m for w in root.findall("world") for m in w.findall("model")
        ]
        if not models:
            raise ValueError("No <model> element found in SDF")
        if model_name is not None:
            models = [m for m in models if m.get("name") == model_name]
            if not models:
                raise ValueError(f"Model '{model_name}' not found in SDF")
        model_el = models[0]
    elif root.tag == "model":
        model_el = root
    else:
        raise ValueError(f"Not an SDF: root tag '{root.tag}'")

    name = model_el.get("name", "model")
    static = (model_el.findtext("static", "false").strip().lower() in ("true", "1"))
    model_pose = _pose_to_matrix(model_el.find("pose"))

    # ---- first pass: model-frame poses of all named frames ----
    M_H: dict[str, npt.NDArray] = {"__model__": np.eye(4)}

    link_els = model_el.findall("link")
    joint_els = model_el.findall("joint")
    frame_els = model_el.findall("frame")

    for link_el in link_els:
        lname = link_el.get("name")
        pose_el = link_el.find("pose")
        rel = pose_el.get("relative_to", "__model__") if pose_el is not None else "__model__"
        H = _pose_to_matrix(pose_el)
        if rel == "__model__":
            M_H[lname] = H
        else:
            M_H[lname] = ("pending", rel, H)  # resolved below

    # Iteratively resolve relative_to chains (links may refer to frames/joints
    # defined later; a few passes suffice for well-formed files).
    def resolve_pending(entries: dict) -> None:
        for _ in range(len(entries) + 2):
            progress = False
            for key, val in list(entries.items()):
                if isinstance(val, tuple) and val[0] == "pending":
                    _, rel, H = val
                    base = entries.get(rel)
                    if isinstance(base, np.ndarray):
                        entries[key] = base @ H
                        progress = True
            if not progress:
                break

    # Joint model-frame poses (relative to child link by default).
    joint_info: dict[str, dict] = {}
    for joint_el in joint_els:
        jname = joint_el.get("name")
        parent_name = joint_el.findtext("parent", "").strip()
        child_name = joint_el.findtext("child", "").strip()
        pose_el = joint_el.find("pose")
        rel = pose_el.get("relative_to", child_name) if pose_el is not None else child_name
        H = _pose_to_matrix(pose_el)
        M_H[jname] = ("pending", rel, H)
        joint_info[jname] = {
            "el": joint_el,
            "parent": parent_name,
            "child": child_name,
        }

    for frame_el in frame_els:
        fname = frame_el.get("name")
        attached_to = frame_el.get("attached_to", "__model__")
        pose_el = frame_el.find("pose")
        rel = pose_el.get("relative_to", attached_to) if pose_el is not None else attached_to
        M_H[fname] = ("pending", rel, _pose_to_matrix(pose_el))

    resolve_pending(M_H)
    unresolved = [k for k, v in M_H.items() if not isinstance(v, np.ndarray)]
    if unresolved:
        raise ValueError(f"Unresolvable <pose relative_to> chains: {unresolved}")

    # ---- links ----
    links: dict[str, LinkDescription] = {}
    parsed_links: list[LinkDescription] = []
    for link_el in link_els:
        lname = link_el.get("name")
        inertial = link_el.find("inertial")
        mass = 0.0
        M6 = np.zeros((6, 6))
        if inertial is not None:
            mass = float(inertial.findtext("mass", "0"))
            L_H_I = _pose_to_matrix(inertial.find("pose"))
            com, R = L_H_I[:3, 3], L_H_I[:3, :3]
            inertia_el = inertial.find("inertia")
            if inertia_el is not None:
                ixx = float(inertia_el.findtext("ixx", "0"))
                iyy = float(inertia_el.findtext("iyy", "0"))
                izz = float(inertia_el.findtext("izz", "0"))
                ixy = float(inertia_el.findtext("ixy", "0"))
                ixz = float(inertia_el.findtext("ixz", "0"))
                iyz = float(inertia_el.findtext("iyz", "0"))
                I_com = np.array(
                    [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]]
                )
            else:
                I_com = np.zeros((3, 3))
            M6 = np_spatial.spatial_inertia(mass, com, R @ I_com @ R.T)
        link = LinkDescription(name=lname, mass=mass, inertia=M6, pose=np.eye(4))
        links[lname] = link
        parsed_links.append(link)

    # ---- joints (convert to URDF convention) ----
    joints: list[JointDescription] = []
    fixed_base = static
    base_link_name = None
    world_H_base = None

    for jname, info in joint_info.items():
        joint_el = info["el"]
        jtype_str = joint_el.get("type", "fixed")
        parent_name, child_name = info["parent"], info["child"]

        if parent_name == "world":
            if jtype_str != "fixed":
                raise ValueError("Only fixed world joints are supported")
            fixed_base = True
            base_link_name = child_name
            world_H_base = M_H[child_name]
            continue

        if jtype_str not in _JOINT_TYPES:
            raise ValueError(f"Unsupported joint type: {jtype_str}")
        if parent_name not in links or child_name not in links:
            logging.warning(f"Joint '{jname}' references unknown links; skipping")
            continue

        lambda_H_J = _inv(M_H[parent_name]) @ M_H[jname]
        J_H_child = _inv(M_H[jname]) @ M_H[child_name]

        axis_el = joint_el.find("axis")
        axis = np.array([1.0, 0, 0])
        lower, upper = -np.inf, np.inf
        damping = friction = 0.0
        if axis_el is not None:
            xyz_el = axis_el.find("xyz")
            if xyz_el is not None and xyz_el.text:
                axis = np.fromstring(xyz_el.text.strip(), sep=" ")
                expressed_in = xyz_el.get("expressed_in")
                if expressed_in not in (None, "", jname):
                    R_eJ = (_inv(M_H[jname]) @ M_H[expressed_in])[:3, :3]
                    axis = R_eJ @ axis
            limit_el = axis_el.find("limit")
            if limit_el is not None and jtype_str in ("revolute", "prismatic"):
                lower = float(limit_el.findtext("lower", "-inf"))
                upper = float(limit_el.findtext("upper", "inf"))
            dynamics_el = axis_el.find("dynamics")
            if dynamics_el is not None:
                damping = float(dynamics_el.findtext("damping", "0"))
                friction = float(dynamics_el.findtext("friction", "0"))

        links[child_name].pose = J_H_child

        joints.append(
            JointDescription(
                name=jname,
                axis=axis,
                pose=lambda_H_J,
                jtype=_JOINT_TYPES[jtype_str],
                parent=links[parent_name],
                child=links[child_name],
                position_limit=(lower, upper),
                friction_viscous=damping,
                friction_static=friction,
                position_limit_spring=float(
                    os.environ.get("JAXSIM_JOINT_POSITION_LIMIT_SPRING", "0")
                ),
                position_limit_damper=float(
                    os.environ.get("JAXSIM_JOINT_POSITION_LIMIT_DAMPER", "0")
                ),
            )
        )

    # Root link: the one that is never a child.
    child_names = {j.child.name for j in joints}
    root_candidates = [l.name for l in parsed_links if l.name not in child_names]
    root_name = base_link_name or (root_candidates[0] if root_candidates else None)
    if root_name is not None and root_name in links:
        links[root_name].pose = M_H[root_name]

    # ---- frames ----
    frames: list[LinkDescription] = []
    for frame_el in frame_els:
        fname = frame_el.get("name")
        attached_to = frame_el.get("attached_to", "__model__")
        # Resolve attached_to down to a link.
        target = attached_to
        while target in joint_info:
            target = joint_info[target]["child"]
        if target == "__model__" or target not in links:
            target = root_name
        if target is None:
            logging.warning(f"Dropping frame '{fname}': no parent link")
            continue
        L_H_F = _inv(M_H[target]) @ M_H[fname]
        frames.append(
            LinkDescription(
                name=fname,
                mass=0.0,
                inertia=np.zeros((6, 6)),
                parent_name=target,
                pose=L_H_F,
            )
        )

    # ---- collisions ----
    collisions: list[CollisionShape] = []
    for link_el in link_els:
        lname = link_el.get("name")
        link = links.get(lname)
        if link is None:
            continue
        for collision_el in link_el.findall("collision"):
            geometry = collision_el.find("geometry")
            if geometry is None:
                continue
            L_H_C = _pose_to_matrix(collision_el.find("pose"))
            box = geometry.find("box")
            sphere = geometry.find("sphere")
            cylinder = geometry.find("cylinder")
            if box is not None:
                size = np.fromstring(box.findtext("size", "0 0 0").strip(), sep=" ")
                collisions.append(
                    collision_utils.create_box_collision(link, size, L_H_C)
                )
            elif sphere is not None:
                radius = float(sphere.findtext("radius", "0"))
                collisions.append(
                    collision_utils.create_sphere_collision(link, radius, L_H_C)
                )
            elif cylinder is not None:
                radius = float(cylinder.findtext("radius", "0"))
                length = float(cylinder.findtext("length", "0"))
                collisions.append(
                    collision_utils.create_box_collision(
                        link, np.array([2 * radius, 2 * radius, length]), L_H_C
                    )
                )

    if world_H_base is None:
        world_H_base = model_pose @ (M_H.get(root_name, np.eye(4)) if root_name else np.eye(4))
        # Floating base: the base pose comes from runtime state; keep the
        # model pose as the root pose hint.
        root_pose = RootPose(
            root_position=world_H_base[:3, 3],
            root_quaternion=_matrix_to_wxyz(world_H_base[:3, :3]),
        )
    else:
        H = model_pose @ world_H_base
        root_pose = RootPose(
            root_position=H[:3, 3], root_quaternion=_matrix_to_wxyz(H[:3, :3])
        )

    return (
        name,
        parsed_links,
        frames,
        joints,
        collisions,
        fixed_base,
        root_pose,
        base_link_name,
    )
