"""Quadruped model family: build, settle, reduce, fast-path coverage.

Mirrors the reference zoo's floating-base legged-robot category
(``/root/reference/tests/conftest.py:319-350``) with the programmatic
12-DoF quadruped (``jaxsim_tpu.models.build_quadruped_urdf``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models


@pytest.fixture(scope="module")
def quadruped_model():
    model = js.JaxSimModel.build_from_model_description(
        models.build_quadruped_urdf()
    )
    params = js.contact.estimate_good_contact_parameters(
        model,
        number_of_active_collidable_points_steady_state=8,
        max_penetration=0.004,
        damping_ratio=0.2,
    )
    return model.replace(contact_params=params)


@pytest.fixture(scope="module")
def stand_pose(quadruped_model):
    s0 = np.zeros(12)
    for i, n in enumerate(quadruped_model.joint_names()):
        if "hip_pitch" in n:
            s0[i] = 0.8
        if "knee" in n:
            s0[i] = -1.5
    return jnp.array(s0)


def test_quadruped_structure(quadruped_model):
    model = quadruped_model
    assert model.number_of_links() == 13
    assert model.number_of_joints() == 12
    assert model.floating_base()
    # Four foot frames.
    feet = [n for n in model.frame_names() if n.endswith("_foot")]
    assert len(feet) == 4
    # 8 trunk corners + 4 × 8 foot-box corners.
    assert model.kin_dyn_parameters.contact_parameters.point.shape == (40, 3)


@pytest.mark.slow
def test_quadruped_settles_standing(quadruped_model, stand_pose):
    model, s0 = quadruped_model, stand_pose
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.32]),
        joint_positions=s0,
    )

    @jax.jit
    def roll(d):
        def body(d, _):
            tau = -60.0 * (d.joint_positions - s0) - 1.5 * d.joint_velocities
            return js.model.step(model, d, joint_force_references=tau), None

        d, _ = jax.lax.scan(body, d, None, length=600)
        return d

    out = roll(data)
    assert bool(jnp.all(jnp.isfinite(out.base_position)))
    # Standing (not fallen, not launched).
    assert 0.12 < float(out.base_position[2]) < 0.45
    # Near-static at the end.
    assert float(jnp.linalg.norm(out.base_velocity[:3])) < 0.3


@pytest.mark.slow
def test_quadruped_fast_path(quadruped_model):
    """The batch-minor engine accepts the quadruped (soft contacts).
    (slow: the 13-link engine rollout compile is ~20 s of single-core
    budget; the engine envelope itself is asserted cheaply below.)"""
    from jaxsim_tpu.ops.batched_engine import BatchedEngine

    eng = BatchedEngine.build(quadruped_model)
    st = eng.init_state(8, key=jax.random.PRNGKey(0))
    out = jax.jit(lambda s: eng.rollout(s, 20))(st)
    assert out.p.shape[-1] == 8
    assert bool(jnp.all(jnp.isfinite(out.p)))


def test_quadruped_engine_envelope(quadruped_model):
    """BatchedEngine.build accepts the quadruped (cheap eager check — the
    stepped fast-path equivalence is in the slow tier)."""
    from jaxsim_tpu.ops.batched_engine import BatchedEngine

    eng = BatchedEngine.build(quadruped_model)
    assert eng.n_joints == 12 and eng.n_points == 40


def test_quadruped_reduce(quadruped_model):
    """Locking the hip-roll joints yields a consistent 8-DoF model."""
    considered = tuple(
        n for n in quadruped_model.joint_names() if "hip_roll" not in n
    )
    reduced = js.model.reduce(
        model=quadruped_model, considered_joints=considered
    )
    assert reduced.number_of_joints() == 8
    assert reduced.floating_base()
    # Total mass is preserved by lumping.
    np.testing.assert_allclose(
        float(js.model.total_mass(reduced)),
        float(js.model.total_mass(quadruped_model)),
        rtol=1e-6,
    )
