"""Mesh collision-point extraction strategies.

Role of reference ``src/jaxsim/parsers/rod/meshes.py:7-103`` without the
trimesh dependency: strategies operate directly on an ``(N, 3)`` vertex array
(mesh loading itself is handled by :mod:`jaxsim_tpu.parsers.mesh_io`).
"""

from __future__ import annotations

import abc
import dataclasses

import numpy as np
import numpy.typing as npt


class MeshPointExtraction(abc.ABC):
    @abc.abstractmethod
    def __call__(self, vertices: npt.NDArray) -> npt.NDArray: ...


@dataclasses.dataclass(frozen=True)
class VertexExtraction(MeshPointExtraction):
    """Use every mesh vertex."""

    def __call__(self, vertices: npt.NDArray) -> npt.NDArray:
        return np.asarray(vertices, dtype=float)


@dataclasses.dataclass(frozen=True)
class RandomSurfaceSampling(MeshPointExtraction):
    """Random subset of vertices (surface-sampling analog without trimesh)."""

    num_points: int = 50
    seed: int = 0

    def __call__(self, vertices: npt.NDArray) -> npt.NDArray:
        v = np.asarray(vertices, dtype=float)
        rng = np.random.default_rng(self.seed)
        idx = rng.choice(len(v), size=min(self.num_points, len(v)), replace=False)
        return v[idx]


@dataclasses.dataclass(frozen=True)
class ObjectMappingExtraction(MeshPointExtraction):
    """Keep the N extreme vertices along an axis (top/bottom extraction)."""

    axis: str = "z"
    direction: str = "lower"
    num_points: int = 10

    def __call__(self, vertices: npt.NDArray) -> npt.NDArray:
        v = np.asarray(vertices, dtype=float)
        ax = "xyz".index(self.axis)
        order = np.argsort(v[:, ax])
        if self.direction == "higher":
            order = order[::-1]
        elif self.direction != "lower":
            raise ValueError(self.direction)
        return v[order[: self.num_points]]


@dataclasses.dataclass(frozen=True)
class AapExtraction(MeshPointExtraction):
    """Axis-aligned-plane band: keep vertices with coordinate ⋛ a threshold."""

    axis: str = "z"
    operator: str = "<"
    value: float = 0.0

    def __call__(self, vertices: npt.NDArray) -> npt.NDArray:
        v = np.asarray(vertices, dtype=float)
        ax = "xyz".index(self.axis)
        ops = {
            "<": np.less,
            "<=": np.less_equal,
            ">": np.greater,
            ">=": np.greater_equal,
        }
        if self.operator not in ops:
            raise ValueError(f"Invalid operator: {self.operator}")
        return v[ops[self.operator](v[:, ax], self.value)]
