"""Model description pipeline: URDF/SDF → :class:`ModelDescription`.

Role of reference ``src/jaxsim/parsers/rod/parser.py:372-420`` without the
``rod`` dependency: format auto-detection + stdlib XML parsers.
"""

from __future__ import annotations

import os
import pathlib

from . import descriptions
from .kinematic_graph import KinematicGraph, KinematicGraphTransforms, RootPose


def _detect_format(model: str | pathlib.Path) -> tuple[str, str]:
    """Return ("urdf"|"sdf", text)."""
    text = model
    if isinstance(model, pathlib.Path) or (
        isinstance(model, str) and len(model) < 4096 and os.path.exists(model)
    ):
        path = pathlib.Path(model)
        text = path.read_text()
        if path.suffix.lower() == ".urdf":
            return "urdf", text
        if path.suffix.lower() in (".sdf", ".world"):
            return "sdf", text
    stripped = text.lstrip()
    # Skip XML prolog / comments to find the root tag.
    import re

    m = re.search(r"<\s*(robot|sdf|model)[\s>]", stripped)
    if m is None:
        raise ValueError("Cannot detect model format (no robot/sdf/model root tag)")
    return ("urdf" if m.group(1) == "robot" else "sdf"), text


def build_model_description(
    model: str | pathlib.Path,
    *,
    is_urdf: bool | None = None,
    considered_joints: list[str] | None = None,
) -> descriptions.ModelDescription:
    """Parse a URDF/SDF (path or string) into a :class:`ModelDescription`.

    By default all fixed joints are lumped away (the reference does the same:
    ``considered_joints`` defaults to every non-fixed joint,
    ``parsers/rod/parser.py:372-420``).
    """
    from jaxsim_tpu.math.joint_model import JointType

    if is_urdf is None:
        fmt, text = _detect_format(model)
    else:
        fmt, text = ("urdf" if is_urdf else "sdf"), model

    if fmt == "urdf":
        from .urdf import parse_urdf as parse

    else:
        from .sdf import parse_sdf as parse

    # Hand the parser the original PATH when we have one: mesh references
    # (package:// / relative) resolve against the model file's directory.
    is_path = isinstance(model, pathlib.Path) or (
        isinstance(model, str) and len(model) < 4096 and os.path.exists(model)
    )
    (
        name,
        links,
        frames,
        joints,
        collisions,
        fixed_base,
        root_pose,
        base_link_name,
    ) = parse(pathlib.Path(model) if is_path else text)

    if considered_joints is None:
        considered_joints = [
            j.name for j in joints if j.jtype is not JointType.Fixed
        ]

    return descriptions.ModelDescription.build_model_from(
        name=name,
        links=links,
        joints=joints,
        frames=frames,
        collisions=collisions,
        fixed_base=fixed_base,
        base_link_name=base_link_name,
        considered_joints=considered_joints,
        model_pose=root_pose,
    )


__all__ = [
    "KinematicGraph",
    "KinematicGraphTransforms",
    "RootPose",
    "build_model_description",
    "descriptions",
]
