"""Minimal mesh vertex loading (no trimesh in this environment).

Supports binary/ASCII STL and OBJ vertex extraction — enough for collision
point generation (``JAXSIM_COLLISION_MESH_ENABLED=1`` gates usage, mirroring
the reference's env flag)."""

from __future__ import annotations

import pathlib
import struct

import numpy as np
import numpy.typing as npt


def load_mesh_vertices(path: str | pathlib.Path) -> npt.NDArray:
    path = pathlib.Path(path)
    suffix = path.suffix.lower()
    if suffix == ".stl":
        return _load_stl(path)
    if suffix == ".obj":
        return _load_obj(path)
    raise ValueError(f"Unsupported mesh format: {suffix}")


def _load_obj(path: pathlib.Path) -> npt.NDArray:
    vertices = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.unique(np.array(vertices, dtype=float), axis=0)


def _load_stl(path: pathlib.Path) -> npt.NDArray:
    raw = path.read_bytes()
    if raw[:5] == b"solid" and b"facet" in raw[:500]:
        # ASCII STL
        vertices = []
        for line in raw.decode(errors="ignore").splitlines():
            line = line.strip()
            if line.startswith("vertex"):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
        return np.unique(np.array(vertices, dtype=float), axis=0)
    # Binary STL: 80-byte header, uint32 triangle count, 50 bytes/triangle.
    (n_tri,) = struct.unpack("<I", raw[80:84])
    data = np.frombuffer(raw[84 : 84 + n_tri * 50], dtype=np.uint8).reshape(n_tri, 50)
    tri = data[:, 12:48].copy().view("<f4").reshape(n_tri, 3, 3)
    return np.unique(tri.reshape(-1, 3).astype(float), axis=0)
