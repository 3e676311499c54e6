"""Data/references/joint API coverage + exception bridge
(reference ``tests/test_api_data.py``, ``test_api_joint.py``,
``test_exceptions.py``)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from tests.conftest import assert_allclose

ALL_REPRS = [js.VelRepr.Inertial, js.VelRepr.Body, js.VelRepr.Mixed]


@pytest.fixture(scope="module")
def model():
    return js.JaxSimModel.build_from_model_description(models.build_humanoid_urdf())


def test_data_build_velocity_representations(model):
    """The same physical velocity expressed in each representation builds
    the same internal state."""
    v_lin = jnp.array([0.3, -0.2, 0.1])
    v_ang = jnp.array([0.05, 0.1, -0.02])
    q = jnp.array([0.9, 0.1, 0.3, -0.2])
    q = q / jnp.linalg.norm(q)
    p = jnp.array([1.0, 2.0, 1.5])

    d_inertial = js.JaxSimModelData.build(
        model,
        base_position=p,
        base_quaternion=q,
        base_linear_velocity=v_lin,
        base_angular_velocity=v_ang,
        velocity_representation=js.VelRepr.Inertial,
    )
    # Convert the inertial velocity into each repr and rebuild: identical
    # internal (inertial) state.
    for repr_ in ALL_REPRS:
        v_repr = js.common.inertial_to_other_representation(
            jnp.concatenate([v_lin, v_ang]),
            repr_,
            d_inertial._base_transform,
            is_force=False,
        )
        d2 = js.JaxSimModelData.build(
            model,
            base_position=p,
            base_quaternion=q,
            base_linear_velocity=v_repr[0:3],
            base_angular_velocity=v_repr[3:6],
            velocity_representation=repr_,
        )
        assert_allclose(
            d2.base_linear_velocity_inertial,
            d_inertial.base_linear_velocity_inertial,
            atol=1e-5,
        )
        assert_allclose(
            d2.base_angular_velocity_inertial,
            d_inertial.base_angular_velocity_inertial,
            atol=1e-5,
        )
        # And the round-trip property returns the original repr velocity.
        assert_allclose(d2.base_velocity, v_repr, atol=1e-5)


def test_data_replace_refreshes_caches(model):
    data = js.JaxSimModelData.build(model)
    data2 = data.replace(model=model, base_position=jnp.array([1.0, 2.0, 3.0]))
    assert_allclose(data2._link_transforms[0, 0:3, 3], jnp.array([1.0, 2.0, 3.0]))
    # Without touching kinematic fields, caches are reused (same object).
    data3 = data2.replace(contact_state=data2.contact_state)
    assert data3._link_transforms is data2._link_transforms


def test_data_valid(model):
    data = js.JaxSimModelData.build(model)
    assert data.valid(model)
    other = js.JaxSimModel.build_from_model_description(models.build_box_urdf())
    assert not data.valid(other)


def test_random_model_data(model):
    data = js.data.random_model_data(model, key=jax.random.PRNGKey(0))
    assert data.valid(model)
    s_min, s_max = js.joint.position_limits(model)
    s = np.asarray(data.joint_positions)
    assert np.all(s >= np.asarray(s_min) - 1e-6)
    assert np.all(s <= np.asarray(s_max) + 1e-6)


def test_joint_api(model):
    names = model.joint_names()
    assert len(names) == 23
    for i, name in enumerate(names):
        assert js.joint.name_to_idx(model, joint_name=name) == i
        assert js.joint.idx_to_name(model, joint_index=i) == name
    lo, hi = js.joint.position_limit(model, joint_index=0)
    assert float(lo) < float(hi)
    s = js.joint.random_joint_positions(model, key=jax.random.PRNGKey(1))
    assert s.shape == (23,)

    with pytest.raises(ValueError):
        js.joint.name_to_idx(model, joint_name="nope")


def test_references_roundtrip(model):
    data = js.data.random_model_data(model, key=jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    f_body = jax.random.normal(key, (model.number_of_links(), 6))

    for repr_ in ALL_REPRS:
        refs = js.JaxSimModelReferences.build(
            model,
            data,
            link_forces=f_body,
            velocity_representation=repr_,
        )
        # Getter returns what the setter stored (same repr).
        with refs.switch_velocity_representation(repr_) as r:
            out = r.link_forces(model, data)
        assert_allclose(out, f_body, rtol=1e-4, atol=1e-4, err_msg=str(repr_))

    refs = js.JaxSimModelReferences.zero(model)
    refs = refs.set_joint_force_references(jnp.ones(23))
    assert_allclose(refs.joint_force_references(model), jnp.ones(23))

    # Named subset setting.
    refs = refs.set_joint_force_references(
        jnp.array([5.0]), model, joint_names=("l_knee",)
    )
    idx = js.joint.name_to_idx(model, joint_name="l_knee")
    assert float(refs.joint_force_references(model)[idx]) == 5.0


def test_apply_frame_forces(model):
    data = js.JaxSimModelData.build(model)
    refs = js.JaxSimModelReferences.zero(model)
    f = jnp.zeros((1, 6)).at[0, 2].set(10.0)
    refs2 = refs.apply_frame_forces(f, model, data, frame_names=("l_sole",))
    # The parent link (l_foot) now carries the force.
    parent = js.frame.idx_of_parent_link(
        model, frame_index=js.frame.name_to_idx(model, frame_name="l_sole")
    )
    total = refs2.link_forces(model, data)
    assert float(total[parent, 2]) == pytest.approx(10.0, rel=1e-5)


def test_exceptions_bridge():
    """Opt-in host-side exceptions on CPU (reference ``test_exceptions.py``)."""
    from jaxsim_tpu import exceptions

    os.environ["JAXSIM_ENABLE_EXCEPTIONS"] = "1"
    try:
        @jax.jit
        def f(x):
            exceptions.raise_value_error_if(x > 1.0, "x too large: threshold 1")
            return x * 2

        assert float(f(jnp.array(0.5))) == 1.0
        with pytest.raises(Exception):
            f(jnp.array(2.0))
            jax.block_until_ready(f(jnp.array(2.0)))
    finally:
        del os.environ["JAXSIM_ENABLE_EXCEPTIONS"]


def test_nan_guard(model):
    from jaxsim_tpu.utils import nan_guard, per_env_nan_mask

    data = js.JaxSimModelData.build(model)
    assert not bool(nan_guard(data))
    bad = data.replace(base_position=jnp.array([jnp.nan, 0.0, 0.0]))
    assert bool(nan_guard(bad))

    batch = jax.vmap(lambda k: js.JaxSimModelData.build(model))(
        jax.random.split(jax.random.PRNGKey(0), 4)
    )
    batch_bad = batch.replace(
        base_position=batch.base_position.at[2, 0].set(jnp.nan)
    )
    mask = per_env_nan_mask(batch_bad)
    assert mask.tolist() == [False, False, True, False]


def test_checkpoint_roundtrip(tmp_path, model):
    from jaxsim_tpu.utils import load_checkpoint, save_checkpoint

    data = js.data.random_model_data(model, key=jax.random.PRNGKey(5))
    save_checkpoint(tmp_path / "ckpt", data)
    restored = load_checkpoint(tmp_path / "ckpt", data)
    assert_allclose(restored.joint_positions, data.joint_positions)
    assert_allclose(restored.base_position, data.base_position)


def test_runtime_validation_wired(model):
    """`raise_if` validation is WIRED into the library: a garbage quaternion
    entering `data.build` or `ops.aba` raises under the CPU opt-in
    (reference ``rbda/utils.py:136-146``)."""
    from jaxsim_tpu import ops

    os.environ["JAXSIM_ENABLE_EXCEPTIONS"] = "1"
    try:
        with pytest.raises(Exception):
            js.JaxSimModelData.build(
                model, base_quaternion=jnp.array([jnp.nan, 0.0, 0.0, 0.0])
            )
        with pytest.raises(Exception):
            js.JaxSimModelData.build(
                model, base_quaternion=jnp.array([0.5, 0.0, 0.0, 0.0])
            )
        # Non-orthonormal base transform at an RBDA entry point.
        bad_H = jnp.eye(4).at[0, 0].set(2.0)
        n = model.number_of_joints()
        with pytest.raises(Exception):
            ops.aba(
                model.kin_dyn_parameters,
                base_transform=bad_H,
                joint_positions=jnp.zeros(n),
                base_velocity_inertial=jnp.zeros(6),
                joint_velocities=jnp.zeros(n),
            )
        # Valid inputs still pass.
        js.JaxSimModelData.build(
            model, base_quaternion=jnp.array([1.0, 0.0, 0.0, 0.0])
        )
    finally:
        del os.environ["JAXSIM_ENABLE_EXCEPTIONS"]
