"""Physics-invariant integration tests (reference ``tests/test_simulations.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from tests.conftest import assert_allclose


def rollout(model, data, n_steps, tau_fn=None, forces_fn=None):
    @jax.jit
    def run(data):
        def body(d, _):
            return (
                js.model.step(
                    model,
                    d,
                    joint_force_references=tau_fn(d) if tau_fn else None,
                    link_forces=forces_fn(d) if forces_fn else None,
                ),
                None,
            )

        out, _ = jax.lax.scan(body, data, None, length=n_steps)
        return out

    return run(data)


def test_box_hovering_under_exact_counterforce():
    """A box with gravity exactly compensated stays put
    (reference ``test_simulations.py:15``)."""
    model = js.JaxSimModel.build_from_model_description(models.build_box_urdf())
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.5]),
        velocity_representation=js.VelRepr.Inertial,
    )
    mg = float(js.model.total_mass(model)) * 9.81
    f = jnp.zeros((1, 6)).at[0, 2].set(mg)

    data_tf = rollout(model, data, 500, forces_fn=lambda d: f)
    assert_allclose(data_tf.base_position, data.base_position, atol=1e-4)
    assert_allclose(
        jnp.linalg.norm(data_tf.base_linear_velocity_inertial), 0.0, atol=1e-4
    )


def test_zero_gravity_momentum_conservation():
    """Without gravity/contacts, linear momentum of a swinging chain is
    conserved (reference ``test_simulations.py:88``; morphology-independent,
    so the smallest floating model keeps the compile out of the fast
    tier's budget)."""
    from tests.test_batched_engine import _tiny_floating_model

    model = _tiny_floating_model(gravity=0.0)
    # Disable contacts by starting far above the terrain.
    key = jax.random.PRNGKey(1)
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 2.0]),
        joint_velocities=0.5 * jax.random.normal(key, (model.dofs(),)),
        base_linear_velocity=jnp.array([0.1, -0.2, 0.05]),
        base_angular_velocity=jnp.array([0.3, 0.1, -0.2]),
        velocity_representation=js.VelRepr.Inertial,
    )

    with data.switch_velocity_representation(js.VelRepr.Inertial) as d0:
        h0 = js.model.total_momentum(model, d0)

    data_tf = rollout(model, data, 200)
    with data_tf.switch_velocity_representation(js.VelRepr.Inertial) as d1:
        h1 = js.model.total_momentum(model, d1)

    # Inertial-frame momentum about the world origin is conserved. The
    # tiny ~1.3 kg model's momenta are O(1); atol=2e-3 covers f32
    # accumulation drift over the 200-step rollout on the near-zero
    # components (the dominant error source at this scale).
    from tests.fidelity import record

    record("momentum_conservation_drift", float(jnp.abs(h1 - h0).max()))
    assert_allclose(h1, h0, rtol=2e-3, atol=2e-3)


def test_box_settles_on_terrain():
    """Soft-contact box settles at ~half height minus steady penetration
    (reference ``test_simulations.py:194``)."""
    model = js.JaxSimModel.build_from_model_description(models.build_box_urdf())
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.2]))
    data_tf = rollout(model, data, 3000)
    z = float(data_tf.base_position[2])
    assert 0.045 < z < 0.051
    assert float(jnp.abs(data_tf.base_linear_velocity_inertial).max()) < 1e-3


@pytest.mark.slow
def test_sphere_settles_on_terrain():
    """(slow: the 50-point fibonacci sphere is the most expensive soft-
    contact compile in the suite; box settling covers the default tier.)"""
    model = js.JaxSimModel.build_from_model_description(models.build_sphere_urdf())
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.3]))
    data_tf = rollout(model, data, 3000)
    z = float(data_tf.base_position[2])
    # Sphere radius 0.15: rests at ~0.15 − penetration. The stability-clamped
    # default stiffness is conservative for many-point spheres, so the
    # steady-state penetration is ~1 cm.
    assert 0.137 < z < 0.152


@pytest.mark.slow
def test_humanoid_long_rollout_stable():
    """The flagship humanoid survives a 2 s PD rollout without NaN and comes
    to rest on the terrain. (slow: humanoid-scale stress rollout.)"""
    model = js.JaxSimModel.build_from_model_description(models.build_humanoid_urdf())
    params = js.contact.estimate_good_contact_parameters(
        model,
        number_of_active_collidable_points_steady_state=8,
        max_penetration=0.006,
        damping_ratio=0.15,
    )
    model = model.replace(contact_params=params)
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.9]))

    data_tf = rollout(
        model,
        data,
        2000,
        tau_fn=lambda d: -60.0 * d.joint_positions - 0.5 * d.joint_velocities,
    )
    assert np.all(np.isfinite(np.asarray(data_tf.base_position)))
    assert float(data_tf.base_position[2]) > 0.0
    assert float(jnp.abs(data_tf.joint_velocities).max()) < 5.0


@pytest.mark.slow
def test_quadruped_rough_relaxed_rigid_settles():
    """Regression (round 5): a PD-held quadruped dropped onto Fourier
    terrain with RELAXED-RIGID contacts settles through the generic
    ``js.model.step`` path. Before the MuJoCo-style impedance floor in
    the diagonal regularizer, near-null Delassus directions (co-planar
    leg collision points) were regularized only by the 1e-6 Tikhonov:
    the solve traded O(1e6) N equal-and-opposite point forces whose
    fluctuation launched the robot to NaN within ~30 steps of this exact
    scenario (docs/ops.md "Relaxed-rigid conditioning")."""
    from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts
    from jaxsim_tpu.terrain import FourierTerrain

    terr = FourierTerrain.build(
        seed=3, num_components=4, amplitude=0.02, wavelength=0.9
    )
    model = js.JaxSimModel.build_from_model_description(
        models.build_quadruped_urdf(),
        terrain=terr,
        contact_model=RelaxedRigidContacts(),
    )
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.42]))
    data_tf = rollout(
        model,
        data,
        600,
        tau_fn=lambda d: -25.0 * d.joint_positions - 0.5 * d.joint_velocities,
    )
    assert np.all(np.isfinite(np.asarray(data_tf.base_position)))
    z = float(data_tf.base_position[2])
    assert 0.3 < z < 0.5, z
    assert float(jnp.abs(data_tf.joint_velocities).max()) < 5.0


def test_joint_limits_enforced():
    """Position-limit springs keep a pendulum inside its limits
    (reference ``test_simulations.py:347``)."""
    import os

    os.environ["JAXSIM_JOINT_POSITION_LIMIT_SPRING"] = "50"
    os.environ["JAXSIM_JOINT_POSITION_LIMIT_DAMPER"] = "1"
    try:
        urdf = models.build_pendulum_urdf(1).replace(
            'lower="-6.28" upper="6.28"', 'lower="-0.5" upper="0.5"'
        )
        model = js.JaxSimModel.build_from_model_description(urdf)
        data = js.JaxSimModelData.build(model, joint_positions=jnp.array([0.0]))
        # Drive the joint hard against the limit.
        data_tf = rollout(model, data, 2000, tau_fn=lambda d: jnp.array([5.0]))
        s = float(data_tf.joint_positions[0])
        assert s < 1.0, s
    finally:
        del os.environ["JAXSIM_JOINT_POSITION_LIMIT_SPRING"]
        del os.environ["JAXSIM_JOINT_POSITION_LIMIT_DAMPER"]


@pytest.fixture(scope="module")
def pendulum_fine_dt_reference():
    """Double-pendulum joint positions after 0.05 s at dt=1e-5 — the shared
    fine-step ground truth for all three integrator parametrizations."""
    urdf = models.build_pendulum_urdf(2)
    model_ref = js.JaxSimModel.build_from_model_description(urdf, time_step=1e-5)
    data_ref = js.JaxSimModelData.build(
        model_ref, joint_positions=jnp.array([0.4, -0.3])
    )
    return rollout(model_ref, data_ref, 5000).joint_positions


@pytest.mark.parametrize(
    "integrator",
    [
        js.IntegratorType.SemiImplicitEuler,
        js.IntegratorType.RungeKutta4,
        js.IntegratorType.RungeKutta4Fast,
    ],
)
def test_integrators_agree_on_pendulum(integrator, pendulum_fine_dt_reference):
    """All integrators track the same double-pendulum trajectory at small dt."""
    urdf = models.build_pendulum_urdf(2)
    model = js.JaxSimModel.build_from_model_description(
        urdf, integrator=integrator, time_step=1e-4
    )
    data = js.JaxSimModelData.build(model, joint_positions=jnp.array([0.4, -0.3]))
    data_tf = rollout(model, data, 500)

    assert_allclose(
        data_tf.joint_positions, pendulum_fine_dt_reference, rtol=5e-3, atol=2e-3
    )


def test_energy_conservation_pendulum():
    """Frictionless pendulum conserves mechanical energy under RK4."""
    model = js.JaxSimModel.build_from_model_description(
        models.build_pendulum_urdf(2),
        integrator=js.IntegratorType.RungeKutta4,
        time_step=1e-4,
    )
    data = js.JaxSimModelData.build(model, joint_positions=jnp.array([1.2, 0.5]))
    E0 = float(js.model.mechanical_energy(model, data))
    data_tf = rollout(model, data, 2000)
    E1 = float(js.model.mechanical_energy(model, data_tf))
    assert abs(E1 - E0) < 2e-2 * abs(E0) + 1e-3
