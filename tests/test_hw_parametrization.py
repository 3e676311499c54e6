"""Hardware-parametrization tests
(reference ``tests/test_api_model_hw_parametrization.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.api import hw_parameters as hw
from tests.conftest import assert_allclose


@pytest.fixture()
def garpez_model():
    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    return hw.with_hw_metadata(model)


def test_metadata_construction(garpez_model):
    meta = garpez_model.kin_dyn_parameters.hw_link_metadata
    assert np.all(np.asarray(meta.link_shape) == hw.LinkShape.Box)
    # Densities recovered from mass/volume: garpez uses 1000, 1000, 1000, 2000.
    assert_allclose(meta.density, jnp.array([1000.0, 1000, 1000, 2000]), rtol=1e-3)


def test_identity_scaling_is_noop(garpez_model):
    model = garpez_model
    sf = hw.ScalingFactors.ones(model.number_of_links())
    model2 = hw.update_hw_parameters(model, sf)
    assert_allclose(
        model2.kin_dyn_parameters.link_parameters.mass,
        model.kin_dyn_parameters.link_parameters.mass,
        rtol=1e-4,
    )
    assert_allclose(
        model2.kin_dyn_parameters.joint_model.lambda_H_pre,
        model.kin_dyn_parameters.joint_model.lambda_H_pre,
        atol=1e-5,
    )
    assert_allclose(
        model2.kin_dyn_parameters.contact_parameters.point,
        model.kin_dyn_parameters.contact_parameters.point,
        atol=1e-5,
    )


def test_scaling_vs_rebuilt_ground_truth(garpez_model):
    """Scaling dims by (a,b,c) must match rebuilding the URDF with scaled
    dimensions (reference ``test_api_model_hw_parametrization.py:82``)."""
    model = garpez_model
    nl = model.number_of_links()

    factor = jnp.array([1.5, 0.8, 1.2])
    sf = hw.ScalingFactors(
        dims=jnp.tile(factor, (nl, 1)), density=jnp.ones(nl)
    )
    model2 = hw.update_hw_parameters(model, sf)

    # Ground truth: rebuild with scaled dims (same densities).
    dims0 = ((0.2, 0.2, 0.2), (0.15, 0.15, 0.6), (0.1, 0.5, 0.1), (0.3, 0.1, 0.1))
    dims1 = tuple(
        tuple(float(d * f) for d, f in zip(d3, factor)) for d3 in dims0
    )
    urdf = models.build_garpez_urdf(dims=dims1)
    truth = js.JaxSimModel.build_from_model_description(urdf)

    assert_allclose(
        model2.kin_dyn_parameters.link_parameters.mass,
        truth.kin_dyn_parameters.link_parameters.mass,
        rtol=1e-3,
    )
    assert_allclose(
        model2.kin_dyn_parameters.link_parameters.center_of_mass,
        truth.kin_dyn_parameters.link_parameters.center_of_mass,
        atol=1e-4,
    )
    # Note: joint placements scale with the parent's z dim only in the truth
    # URDF; apply_scaling reproduces that via the CoM-frame scaling.
    assert_allclose(
        model2.kin_dyn_parameters.joint_model.lambda_H_pre[1:, :3, 3],
        truth.kin_dyn_parameters.joint_model.lambda_H_pre[1:, :3, 3],
        atol=1e-4,
    )
    # Inertia tensors.
    assert_allclose(
        model2.kin_dyn_parameters.link_parameters.inertia_elements,
        truth.kin_dyn_parameters.link_parameters.inertia_elements,
        rtol=2e-3,
        atol=1e-6,
    )


def test_density_scaling(garpez_model):
    model = garpez_model
    nl = model.number_of_links()
    sf = hw.ScalingFactors(dims=jnp.ones((nl, 3)), density=2.0 * jnp.ones(nl))
    model2 = hw.update_hw_parameters(model, sf)
    assert_allclose(
        model2.kin_dyn_parameters.link_parameters.mass,
        2.0 * model.kin_dyn_parameters.link_parameters.mass,
        rtol=1e-4,
    )


def test_scaling_is_differentiable(garpez_model):
    """Gradient-based morphology optimization works end-to-end
    (reference ``test_api_model_hw_parametrization.py:330``)."""
    model = garpez_model
    nl = model.number_of_links()

    target_mass = 1.3 * float(js.model.total_mass(model))

    def loss(log_s):
        s = jnp.exp(log_s)
        sf = hw.ScalingFactors(
            dims=jnp.tile(s[:, None], (1, 3)), density=jnp.ones(nl)
        )
        m2 = hw.update_hw_parameters(model, sf)
        return (js.model.total_mass(m2) - target_mass) ** 2

    log_s = jnp.zeros(nl)
    grad_fn = jax.jit(jax.grad(loss))
    g = grad_fn(log_s)
    assert np.all(np.isfinite(np.asarray(g)))
    # A few gradient steps reduce the loss.
    l0 = float(loss(log_s))
    for _ in range(200):
        log_s = log_s - 1e-4 * grad_fn(log_s)
    l1 = float(loss(log_s))
    assert l1 < 0.1 * l0


def test_vmap_scaling(garpez_model):
    model = garpez_model
    nl = model.number_of_links()

    def total_mass_scaled(scale):
        sf = hw.ScalingFactors(
            dims=jnp.tile(scale[:, None], (1, 3)), density=jnp.ones(nl)
        )
        return js.model.total_mass(hw.update_hw_parameters(model, sf))

    scales = jnp.stack([jnp.ones(nl), 1.2 * jnp.ones(nl), 0.8 * jnp.ones(nl)])
    masses = jax.vmap(total_mass_scaled)(scales)
    assert masses.shape == (3,)
    m0 = float(js.model.total_mass(model))
    assert_allclose(masses[0], m0, rtol=1e-4)
    assert_allclose(masses[1], m0 * 1.2**3, rtol=1e-3)


def test_urdf_export_roundtrip(garpez_model):
    """export → rebuild preserves dynamics
    (reference ``test_api_model_hw_parametrization.py:208``)."""
    model = garpez_model
    nl = model.number_of_links()
    sf = hw.ScalingFactors(
        dims=1.3 * jnp.ones((nl, 3)), density=jnp.ones(nl)
    )
    model2 = hw.update_hw_parameters(model, sf)

    urdf = hw.export_updated_model(model2)
    rebuilt = js.JaxSimModel.build_from_model_description(urdf)

    assert_allclose(
        rebuilt.kin_dyn_parameters.link_parameters.mass,
        model2.kin_dyn_parameters.link_parameters.mass,
        rtol=1e-4,
    )
    s = jnp.array([0.2, -0.4, 0.6])
    from jaxsim_tpu import ops

    M1 = ops.crba(model2.kin_dyn_parameters, joint_positions=s)
    M2 = ops.crba(rebuilt.kin_dyn_parameters, joint_positions=s)
    assert_allclose(M1, M2, rtol=1e-3, atol=1e-4)


def test_unsupported_links_not_scaled():
    """Links without a recognized shape keep their parameters."""
    model = js.JaxSimModel.build_from_model_description(
        models.build_pendulum_urdf(2)
    )
    model = hw.with_hw_metadata(model)
    meta = model.kin_dyn_parameters.hw_link_metadata
    assert np.all(np.asarray(meta.link_shape) == hw.LinkShape.Unsupported)

    nl = model.number_of_links()
    sf = hw.ScalingFactors(dims=2.0 * jnp.ones((nl, 3)), density=jnp.ones(nl))
    model2 = hw.update_hw_parameters(model, sf)
    assert_allclose(
        model2.kin_dyn_parameters.link_parameters.mass,
        model.kin_dyn_parameters.link_parameters.mass,
    )
