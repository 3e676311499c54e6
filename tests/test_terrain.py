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
