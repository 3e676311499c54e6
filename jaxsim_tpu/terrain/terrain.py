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


@dataclasses.dataclass(frozen=True)
class FourierTerrain(Terrain):
    """Spectral rough terrain: ``h(x, y) = h0 + Σ_k A_k sin(kx_k x + ky_k y
    + φ_k)``.

    Beyond the reference core (no rough-terrain support outside MuJoCo
    hfields): a procedurally generated, infinitely extended, C∞ rough
    terrain whose height AND analytic normal are pure elementwise trig —
    no grid, no gathers — so it lowers inside the fused Pallas step kernel
    (Mosaic has no gather/dynamic_slice; a grid heightmap cannot run
    in-kernel) and differentiates exactly. The spectrum is a hashable
    static payload participating in the JIT cache key."""

    _h0: float = 0.0
    _amp: tuple = ()
    _kx: tuple = ()
    _ky: tuple = ()
    _phase: tuple = ()

    @staticmethod
    def build(
        *,
        seed: int = 0,
        num_components: int = 8,
        amplitude: float = 0.04,
        wavelength: float = 1.0,
        height: float = 0.0,
        spectrum=None,
    ) -> "FourierTerrain":
        """Random isotropic spectrum: directions uniform on the circle,
        wavenumbers log-uniform in [2π/λ, 3·2π/λ], amplitudes ∝ 1/k
        normalized so the height RMS is ``amplitude``. Pass ``spectrum =
        (amp, kx, ky, phase)`` arrays to use an explicit spectrum."""
        if spectrum is not None:
            amp, kx, ky, phase = (np.asarray(a, dtype=float) for a in spectrum)
        else:
            rng = np.random.default_rng(seed)
            th = rng.uniform(0.0, 2 * np.pi, num_components)
            k0 = 2 * np.pi / wavelength
            k = np.exp(rng.uniform(np.log(k0), np.log(3 * k0), num_components))
            amp = 1.0 / k
            # RMS of Σ A_k sin(·) with independent phases is √(Σ A_k²/2).
            amp = amp * (amplitude / np.sqrt(np.sum(amp**2) / 2.0))
            kx, ky = k * np.cos(th), k * np.sin(th)
            phase = rng.uniform(0.0, 2 * np.pi, num_components)
        return FourierTerrain(
            _h0=float(height),
            _amp=tuple(amp.tolist()),
            _kx=tuple(kx.tolist()),
            _ky=tuple(ky.tolist()),
            _phase=tuple(phase.tolist()),
        )

    def spectrum(self) -> np.ndarray:
        """(4, K) static spectrum rows ``amp, kx, ky, phase``."""
        return np.stack(
            [
                np.asarray(self._amp),
                np.asarray(self._kx),
                np.asarray(self._ky),
                np.asarray(self._phase),
            ]
        )

    def height(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Float:
        x = jnp.asarray(x, dtype=float)
        y = jnp.asarray(y, dtype=float)
        amp = jnp.asarray(self._amp)
        arg = (
            x[..., None] * jnp.asarray(self._kx)
            + y[..., None] * jnp.asarray(self._ky)
            + jnp.asarray(self._phase)
        )
        return self._h0 + jnp.sum(amp * jnp.sin(arg), axis=-1)

    def normal(self, x: jtp.FloatLike, y: jtp.FloatLike) -> jtp.Vector:
        """Analytic outward unit normal (exact gradient, no finite
        differences — keeps the generic path bit-identical to the fused
        kernel's in-kernel terrain)."""
        x = jnp.asarray(x, dtype=float)
        y = jnp.asarray(y, dtype=float)
        amp = jnp.asarray(self._amp)
        kx = jnp.asarray(self._kx)
        ky = jnp.asarray(self._ky)
        arg = x[..., None] * kx + y[..., None] * ky + jnp.asarray(self._phase)
        c = jnp.cos(arg)
        dhdx = jnp.sum(amp * kx * c, axis=-1)
        dhdy = jnp.sum(amp * ky * c, axis=-1)
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], axis=-1)
        return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class HeightmapTerrain(Terrain):
    """Grid heightmap with bilinear interpolation.

    Beyond the reference core (which supports heightmaps only in the MuJoCo
    visualization layer, ``mujoco/model.py:447-482``): a fully differentiable
    terrain usable by every contact model. The grid is a hashable static
    payload so the terrain participates in the JIT cache key.
    """

    _grid: "object" = None  # HashedNumpyArray (ny, nx) heights
    _extent: tuple = (-5.0, 5.0, -5.0, 5.0)  # (x0, x1, y0, y1)

    @staticmethod
    def build(
        heights, *, extent: tuple[float, float, float, float] = (-5.0, 5.0, -5.0, 5.0)
    ) -> "HeightmapTerrain":
        from jaxsim_tpu.utils import HashedNumpyArray

        h = np.asarray(heights, dtype=float)
        if h.ndim != 2:
            raise ValueError("Heightmap must be a 2D grid")
        return HeightmapTerrain(_grid=HashedNumpyArray(h), _extent=tuple(extent))

    def height(self, x, y):
        grid = jnp.asarray(self._grid.get())
        ny, nx = grid.shape
        x0, x1, y0, y1 = self._extent
        x = jnp.asarray(x, dtype=float)
        y = jnp.asarray(y, dtype=float)

        # Continuous grid coordinates, clamped to the interior.
        gx = jnp.clip((x - x0) / (x1 - x0) * (nx - 1), 0.0, nx - 1 - 1e-6)
        gy = jnp.clip((y - y0) / (y1 - y0) * (ny - 1), 0.0, ny - 1 - 1e-6)
        ix = jnp.floor(gx).astype(int)
        iy = jnp.floor(gy).astype(int)
        fx = gx - ix
        fy = gy - iy

        h00 = grid[iy, ix]
        h01 = grid[iy, ix + 1]
        h10 = grid[iy + 1, ix]
        h11 = grid[iy + 1, ix + 1]
        return (
            h00 * (1 - fx) * (1 - fy)
            + h01 * fx * (1 - fy)
            + h10 * (1 - fx) * fy
            + h11 * fx * fy
        )

    def __hash__(self) -> int:
        return hash((hash(self._grid), self._extent, self.delta))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, HeightmapTerrain) and hash(self) == hash(other)
