"""Terrain models, including the heightmap (beyond-reference feature)."""

import jax
import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.terrain import FlatTerrain, HeightmapTerrain, PlaneTerrain
from tests.conftest import assert_allclose


def test_flat_and_plane():
    f = FlatTerrain.build(height=0.3)
    assert abs(float(f.height(1.0, 2.0)) - 0.3) < 1e-6
    assert_allclose(f.normal(0.0, 0.0), jnp.array([0.0, 0.0, 1.0]))

    p = PlaneTerrain.build(height=0.0, normal=(0.2, 0.0, 1.0))
    # Walking uphill in -x.
    assert float(p.height(-1.0, 0.0)) > 0.0
    n = np.asarray(p.normal(0.0, 0.0))
    assert n[0] > 0 and abs(np.linalg.norm(n) - 1) < 1e-6


def test_heightmap_interpolation():
    xs = np.linspace(-5, 5, 21)
    ys = np.linspace(-5, 5, 21)
    X, Y = np.meshgrid(xs, ys)
    grid = 0.1 * np.sin(X) * np.cos(Y)
    t = HeightmapTerrain.build(grid, extent=(-5, 5, -5, 5))

    # Exact at grid nodes.
    assert_allclose(t.height(xs[3], ys[7]), grid[7, 3], atol=1e-6)
    # Batched query.
    h = t.height(jnp.array([0.0, 1.0]), jnp.array([0.0, 0.5]))
    assert h.shape == (2,)
    # Normal points mostly up.
    n = np.asarray(t.normal(1.0, 1.0))
    assert n[2] > 0.9

    # Participates in the JIT cache key (hashable, equal grids compare equal).
    t2 = HeightmapTerrain.build(grid, extent=(-5, 5, -5, 5))
    assert hash(t) == hash(t2) and t == t2


def test_box_settles_on_heightmap():
    """Soft contacts work against a non-flat terrain."""
    grid = 0.2 * np.ones((11, 11))  # constant plateau at z = 0.2
    terrain = HeightmapTerrain.build(grid, extent=(-5, 5, -5, 5))
    model = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(), terrain=terrain
    )
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.5]))

    @jax.jit
    def run(d):
        def body(d, _):
            return js.model.step(model, d), None

        out, _ = jax.lax.scan(body, d, None, length=2000)
        return out

    out = run(data)
    z = float(out.base_position[2])
    assert 0.24 < z < 0.26, z  # plateau + half box height - penetration


def test_fourier_terrain_height_normal():
    """FourierTerrain (beyond-reference): analytic normal matches the
    finite-difference normal of the height field; the spectrum RMS
    matches the requested amplitude; the terrain is hashable/static."""
    from jaxsim_tpu.terrain import FourierTerrain

    t = FourierTerrain.build(seed=7, num_components=8, amplitude=0.05)
    x = jnp.array([0.3, -1.2, 4.0])
    y = jnp.array([0.5, 2.0, -3.3])
    n = t.normal(x, y)
    d = 1e-4
    dhdx = (t.height(x + d, y) - t.height(x - d, y)) / (2 * d)
    dhdy = (t.height(x, y + d) - t.height(x, y - d)) / (2 * d)
    nfd = jnp.stack([-dhdx, -dhdy, jnp.ones_like(dhdx)], -1)
    nfd = nfd / jnp.linalg.norm(nfd, axis=-1, keepdims=True)
    assert_allclose(n, nfd, atol=5e-4)
    assert np.linalg.norm(np.asarray(n), axis=-1).max() < 1 + 1e-5

    # RMS over a wide sample ≈ amplitude (independent random phases).
    xs = jnp.linspace(-20, 20, 300)
    hs = t.height(xs[:, None] * jnp.ones(300), xs[None, :] * jnp.ones((300, 1)))
    rms = float(jnp.sqrt(jnp.mean((hs - jnp.mean(hs)) ** 2)))
    assert 0.02 < rms < 0.09, rms
    # Hashable static payload (participates in the JIT cache key).
    assert hash(t) == hash(FourierTerrain.build(seed=7, num_components=8, amplitude=0.05))


def test_fourier_terrain_generic_settling():
    """A sphere dropped on the spectral terrain settles at the local
    terrain height (generic js.model.step path)."""
    from jaxsim_tpu.terrain import FourierTerrain

    t = FourierTerrain.build(seed=3, num_components=6, amplitude=0.03, wavelength=0.8)
    # backend="generic": this test covers the reference-style generic step
    # path on rough terrain (the engine path has its own equivalence tests).
    model = js.JaxSimModel.build_from_model_description(
        models.build_sphere_urdf(), terrain=t, backend="generic"
    )
    h0 = float(t.height(jnp.array(0.0), jnp.array(0.0)))
    data = js.JaxSimModelData.build(
        model, base_position=jnp.array([0.0, 0.0, h0 + 0.2])
    )
    step = jax.jit(lambda d: js.model.step(model, d))
    for _ in range(600):
        data = step(data)
    # The sphere rests ON the rough surface (it may still creep along a
    # slope): its lowest collidable point sits at the local terrain
    # height, within Hunt/Crossley penetration, and nothing tunneled.
    pts = np.asarray(js.contact.collidable_point_positions(model, data))
    gap = pts[:, 2] - np.asarray(t.height(pts[:, 0], pts[:, 1]))
    assert gap.min() > -0.02, gap.min()  # no tunneling
    assert gap.min() < 0.01, gap.min()  # touching, not floating
    assert np.all(np.isfinite(np.asarray(data.base_position)))
