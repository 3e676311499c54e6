"""Model → MJCF conversion for visualization.

Role of reference ``src/jaxsim/mujoco/loaders.py:68-707`` (rod→URDF→MuJoCo +
lxml surgery). Here MuJoCo parses URDF natively; SDF inputs are converted via
the framework's parser + URDF re-export. The conversion injects a freejoint
for floating-base models, ground plane, lights, and cameras.
"""

from __future__ import annotations

import os
import pathlib
import re
import tempfile

import mujoco
import numpy as np
from lxml import etree


def _mjcf_surgery(
    mjcf: str,
    *,
    floating: bool,
    heightmap: bool = False,
    plane_normal: tuple[float, float, float] = (0.0, 0.0, 1.0),
    cameras: list[dict] | None = None,
) -> str:
    """Post-process the MuJoCo-generated MJCF (reference
    ``loaders.py:168-611``): freejoint injection, ground, assets, cameras."""
    root = etree.fromstring(mjcf.encode())

    worldbody = root.find("worldbody")
    if worldbody is None:
        worldbody = etree.SubElement(root, "worldbody")

    # Floating base: wrap the first body with a freejoint.
    if floating:
        bodies = worldbody.findall("body")
        if bodies and bodies[0].find("freejoint") is None:
            fj = etree.Element("freejoint")
            fj.set("name", "world_to_base")
            bodies[0].insert(0, fj)

    # Assets: checkered ground texture.
    asset = root.find("asset")
    if asset is None:
        asset = etree.SubElement(root, "asset")
    etree.SubElement(
        asset,
        "texture",
        type="2d",
        name="groundplane",
        builtin="checker",
        mark="edge",
        rgb1="0.2 0.3 0.4",
        rgb2="0.1 0.2 0.3",
        markrgb="0.8 0.8 0.8",
        width="300",
        height="300",
    )
    etree.SubElement(
        asset,
        "material",
        name="groundplane",
        texture="groundplane",
        texuniform="true",
        texrepeat="5 5",
        reflectance="0.2",
    )

    if heightmap:
        etree.SubElement(
            asset,
            "hfield",
            name="terrain",
            nrow="100",
            ncol="100",
            size="5 5 1 0.1",
        )
        etree.SubElement(
            worldbody,
            "geom",
            name="floor",
            type="hfield",
            hfield="terrain",
            material="groundplane",
        )
    else:
        n = np.array(plane_normal, dtype=float)
        n = n / np.linalg.norm(n)
        # MuJoCo planes have +z normal in the geom frame; rotate via zaxis.
        etree.SubElement(
            worldbody,
            "geom",
            name="floor",
            type="plane",
            size="0 0 0.05",
            material="groundplane",
            zaxis=f"{n[0]} {n[1]} {n[2]}",
        )

    etree.SubElement(
        worldbody,
        "light",
        pos="0 0 3",
        dir="0 0 -1",
        directional="true",
    )

    for cam in cameras or []:
        etree.SubElement(worldbody, "camera", **{k: str(v) for k, v in cam.items()})

    return etree.tostring(root, pretty_print=True).decode()


class ModelToMjcf:
    """Dispatch URDF/SDF string/path → MJCF string
    (reference ``loaders.py:614-707``)."""

    @staticmethod
    def convert(
        model: str | pathlib.Path,
        *,
        heightmap: bool = False,
        plane_normal: tuple[float, float, float] = (0.0, 0.0, 1.0),
        cameras: list[dict] | None = None,
    ) -> str:
        from jaxsim_tpu.parsers import _detect_format

        fmt, text = _detect_format(model)
        if fmt == "urdf":
            return UrdfToMjcf.convert(
                text,
                heightmap=heightmap,
                plane_normal=plane_normal,
                cameras=cameras,
            )
        return SdfToMjcf.convert(
            text, heightmap=heightmap, plane_normal=plane_normal, cameras=cameras
        )


class UrdfToMjcf:
    """URDF → MJCF via MuJoCo's native URDF compiler + XML surgery."""

    @staticmethod
    def convert(
        urdf: str | pathlib.Path,
        *,
        heightmap: bool = False,
        plane_normal: tuple[float, float, float] = (0.0, 0.0, 1.0),
        cameras: list[dict] | None = None,
    ) -> str:
        text = urdf
        if isinstance(urdf, pathlib.Path) or (
            isinstance(urdf, str) and len(urdf) < 4096 and os.path.exists(urdf)
        ):
            text = pathlib.Path(urdf).read_text()

        floating = '<link name="world"' not in text and "<link name='world'" not in text

        # MuJoCo's URDF importer discards <visual> geometry unless told not
        # to; inject the extension block if the URDF doesn't carry one. The
        # block must land INSIDE <robot> (after its opening tag) — an XML
        # declaration or comments may precede it, and a top-level <mujoco>
        # element would make MuJoCo parse the file as (empty) MJCF.
        if "<mujoco>" not in text:
            text = re.sub(
                r"(<robot\b[^>]*>)",
                r'\1<mujoco><compiler discardvisual="false" fusestatic="false"/></mujoco>',
                text,
                count=1,
            )

        # Parse the URDF through MuJoCo's MjSpec (structure-preserving, no
        # static fusion) and add the freejoint programmatically.
        spec = mujoco.MjSpec.from_string(text)
        if floating:
            first = spec.worldbody.first_body()
            if first is not None:
                first.add_freejoint()
        mjcf = spec.to_xml()

        return _mjcf_surgery(
            mjcf,
            floating=False,  # freejoint already added via MjSpec
            heightmap=heightmap,
            plane_normal=plane_normal,
            cameras=cameras,
        )


class SdfToMjcf:
    """SDF → MJCF via the framework parser + URDF re-export."""

    @staticmethod
    def convert(
        sdf: str | pathlib.Path,
        *,
        heightmap: bool = False,
        plane_normal: tuple[float, float, float] = (0.0, 0.0, 1.0),
        cameras: list[dict] | None = None,
    ) -> str:
        import jaxsim_tpu.api as js
        from jaxsim_tpu.api import hw_parameters as hw

        model = js.JaxSimModel.build_from_model_description(sdf, is_urdf=False)
        urdf = hw.export_updated_model(model)
        return UrdfToMjcf.convert(
            urdf, heightmap=heightmap, plane_normal=plane_normal, cameras=cameras
        )


# Compatibility alias matching the reference name.
RodModelToMjcf = ModelToMjcf
