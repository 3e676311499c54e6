"""Smooth terrain models (reference ``src/jaxsim/terrain/terrain.py``).

A terrain is a height field z = h(x, y) with an outward normal. Terrains are
static fields of the model (they participate in the JIT cache key), so
subclasses must be hashable frozen dataclasses over plain floats/tuples.
"""

from __future__ import annotations

import abc
import dataclasses

import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.typing as jtp


@dataclasses.dataclass(frozen=True)
class Terrain(abc.ABC):
    """Base terrain: height field + finite-difference normal."""

    delta: float = 0.010

    @abc.abstractmethod
    def height(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Float:
        """Terrain height at (x, y); batched over leading dims."""

    def normal(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Vector:
        """Outward unit normal at (x, y) via central finite differences
        (reference ``terrain/terrain.py:39-62``)."""
        hxp = self.height(x + self.delta, y)
        hxm = self.height(x - self.delta, y)
        hyp = self.height(x, y + self.delta)
        hym = self.height(x, y - self.delta)
        dhdx = (hxp - hxm) / (2 * self.delta)
        dhdy = (hyp - hym) / (2 * self.delta)
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class FlatTerrain(Terrain):
    """Horizontal plane z = height."""

    _height: float = 0.0

    @staticmethod
    def build(height: float = 0.0) -> "FlatTerrain":
        return FlatTerrain(_height=float(height))

    def height(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Float:
        x = jnp.asarray(x)
        return jnp.full_like(x, self._height, dtype=float)

    def normal(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Vector:
        x = jnp.asarray(x, dtype=float)
        n = jnp.zeros(x.shape + (3,))
        return n.at[..., 2].set(1.0)


@dataclasses.dataclass(frozen=True)
class PlaneTerrain(FlatTerrain):
    """Inclined plane through (0, 0, height) with the given normal
    (reference ``terrain/terrain.py:123-238``)."""

    _normal: tuple[float, float, float] = (0.0, 0.0, 1.0)

    @staticmethod
    def build(
        height: float = 0.0, *, normal: tuple[float, float, float] = (0.0, 0.0, 1.0)
    ) -> "PlaneTerrain":
        n = np.array(normal, dtype=float)
        norm = np.linalg.norm(n)
        if norm == 0 or n[2] <= 0:
            raise ValueError(f"Invalid plane normal: {normal}")
        n = n / norm
        return PlaneTerrain(_height=float(height), _normal=tuple(n.tolist()))

    def height(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Float:
        # Plane: a(x-0) + b(y-0) + c(z-h) = 0  →  z = h - (a x + b y)/c.
        a, b, c = self._normal
        x, y = jnp.asarray(x, dtype=float), jnp.asarray(y, dtype=float)
        return self._height - (a * x + b * y) / c

    def normal(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Vector:
        x = jnp.asarray(x, dtype=float)
        n = jnp.asarray(self._normal, dtype=float)
        return jnp.broadcast_to(n, x.shape + (3,))
