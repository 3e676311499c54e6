"""Rigid/relaxed-rigid contacts and weld constraints
(reference ``tests/test_simulations.py:245-549``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.ops.contacts import (
    RelaxedRigidContacts,
    RelaxedRigidContactsParams,
    RigidContacts,
    RigidContactsParams,
)
from tests.conftest import assert_allclose


def rollout(model, data, n_steps, tau_fn=None):
    @jax.jit
    def run(data):
        def body(d, _):
            return (
                js.model.step(
                    model, d, joint_force_references=tau_fn(d) if tau_fn else None
                ),
                None,
            )

        out, _ = jax.lax.scan(body, data, None, length=n_steps)
        return out

    return run(data)


@pytest.mark.parametrize(
    "contact_model, contact_params",
    [
        (RigidContacts(), RigidContactsParams.build(mu=0.5, K=1e3, D=63.0)),
        # The generic relaxed-rigid settling compile is covered by the
        # engine equivalence test; keep one generic hard-contact settle.
        pytest.param(
            RelaxedRigidContacts(),
            RelaxedRigidContactsParams.build(),
            marks=pytest.mark.slow,
        ),
    ],
    ids=["rigid", "relaxed_rigid"],
)
def test_box_settles_rigid(contact_model, contact_params):
    model = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(),
        contact_model=contact_model,
        contact_params=contact_params,
    )
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.3]))
    data_tf = rollout(model, data, 2000)
    z = float(data_tf.base_position[2])
    assert 0.048 < z < 0.052, z
    assert float(jnp.abs(data_tf.base_linear_velocity_inertial).max()) < 5e-3


def test_rigid_contacts_no_penetration_drift():
    """Rigid contacts hold the box at the surface over a long horizon."""
    model = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(),
        contact_model=RigidContacts(),
        contact_params=RigidContactsParams.build(mu=0.5, K=1e3, D=63.0),
    )
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.0499]))
    data_tf = rollout(model, data, 3000)
    assert abs(float(data_tf.base_position[2]) - 0.05) < 2e-3


def _four_bar_urdf():
    """Two equal arms on co-located pivots; welding the tips enforces
    θ_a ≡ θ_b exactly."""
    return """<robot name="fourbar">
  <link name="world"/>
  <joint name="world_to_base" type="fixed">
    <origin xyz="0 0 1"/><parent link="world"/><child link="fb_base"/>
  </joint>
  <link name="fb_base">
    <inertial><mass value="1"/><inertia ixx="0.01" iyy="0.01" izz="0.01"/></inertial>
  </link>
  <joint name="shoulder_a" type="revolute">
    <origin xyz="0 0 0"/><parent link="fb_base"/><child link="arm_a"/>
    <axis xyz="0 1 0"/><limit lower="-3" upper="3" effort="100" velocity="10"/>
  </joint>
  <link name="arm_a">
    <inertial><origin xyz="0 0 -0.25"/><mass value="1"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <joint name="tip_a_frame" type="fixed">
    <origin xyz="0 0 -0.5"/><parent link="arm_a"/><child link="tip_a"/>
  </joint>
  <link name="tip_a"/>
  <joint name="shoulder_b" type="revolute">
    <origin xyz="0 0 0"/><parent link="fb_base"/><child link="arm_b"/>
    <axis xyz="0 1 0"/><limit lower="-3" upper="3" effort="100" velocity="10"/>
  </joint>
  <link name="arm_b">
    <inertial><origin xyz="0 0 -0.25"/><mass value="1"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.001"/></inertial>
  </link>
  <joint name="tip_b_frame" type="fixed">
    <origin xyz="0 0 -0.5"/><parent link="arm_b"/><child link="tip_b"/>
  </joint>
  <link name="tip_b"/>
</robot>"""


def test_weld_constraint_parallelogram():
    """Welding the two tips of co-pivoted equal arms enforces θ_a(t) == θ_b(t)
    (reference analog: ``tests/test_simulations.py:549``)."""
    from jaxsim_tpu.api.kin_dyn_parameters import ConstraintMap, ConstraintType

    urdf = _four_bar_urdf()
    model0 = js.JaxSimModel.build_from_model_description(urdf)
    idx1 = js.frame.name_to_idx(model0, frame_name="tip_a")
    idx2 = js.frame.name_to_idx(model0, frame_name="tip_b")

    constraints = ConstraintMap().add_constraint(
        idx1, idx2, ConstraintType.Weld, K_P=100.0
    )
    model = js.JaxSimModel.build_from_model_description(
        urdf, constraints=constraints, time_step=5e-4
    )

    data = js.JaxSimModelData.build(
        model, joint_positions=jnp.array([0.4, 0.4])
    )
    # Verify the constraint is satisfied initially.
    H1 = js.frame.transform(model, data, frame_index=idx1)
    H2 = js.frame.transform(model, data, frame_index=idx2)
    assert_allclose(H1[0:3, 3], H2[0:3, 3], atol=1e-5)

    # Swing under gravity + a torque on arm A only.
    data_tf = rollout(model, data, 2000, tau_fn=lambda d: jnp.array([1.0, 0.0]))

    s = np.asarray(data_tf.joint_positions)
    assert np.all(np.isfinite(s))
    # The weld transmits the motion: both angles move together.
    assert abs(s[0] - s[1]) < 5e-2, s
    # And the tip frames stay coincident.
    H1 = js.frame.transform(model, data_tf, frame_index=idx1)
    H2 = js.frame.transform(model, data_tf, frame_index=idx2)
    assert_allclose(H1[0:3, 3], H2[0:3, 3], atol=5e-3)


def test_rigid_impact_removes_normal_velocity():
    """update_velocity_after_impact zeroes the normal velocity of active
    points (reference ``test_simulations.py:245``)."""
    model = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(),
        contact_model=RigidContacts(),
        contact_params=RigidContactsParams.build(mu=0.5, K=1e3, D=63.0),
    )
    # Penetrating with downward velocity.
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.049]),
        base_linear_velocity=jnp.array([0.0, 0.0, -1.0]),
    )
    data2 = model.contact_model.update_velocity_after_impact(model, data)
    _, W_pd_C = js.contact.collidable_point_kinematics(model, data2)
    # Active (penetrating) points end with ~zero velocity.
    delta = 0.05 - np.asarray(js.contact.collidable_point_positions(model, data2))[:, 2]
    active = delta > 0
    assert np.abs(np.asarray(W_pd_C)[active]).max() < 1e-4
