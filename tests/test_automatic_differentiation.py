"""AD correctness (reference ``tests/test_automatic_differentiation.py``).

``check_grads`` fwd+rev order 1 on the RBDAs and the full step. Running in
float32 (TPU-first policy) requires coarser FD steps/tolerances than the
reference's float64 defaults; the env vars JAXSIM_TEST_AD_ORDER and
JAXSIM_TEST_FD_STEP_SIZE are honored like the reference's.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads as jax_check_grads

import jaxsim_tpu.api as js
from jaxsim_tpu import models, ops
from jaxsim_tpu.api.kin_dyn_parameters import KinDynParameters
from jaxsim_tpu.math import Transform
from jaxsim_tpu.parsers import build_model_description

AD_ORDER = int(os.environ.get("JAXSIM_TEST_AD_ORDER", "1"))
# f32 FD: eps ≈ cbrt(f32 eps) like the reference's resolution^(1/3).
EPS = float(os.environ.get("JAXSIM_TEST_FD_STEP_SIZE", np.cbrt(np.finfo(np.float32).eps)))


def check_grads(f, args, **kw):
    # jit the function under test: check_grads evaluates it (and its
    # jvp/vjp) dozens of times, and op-by-op eager dispatch of an unrolled
    # RBDA costs more than the one-time compile it avoids.
    jax_check_grads(
        jax.jit(f),
        args,
        order=AD_ORDER,
        modes=("fwd", "rev"),
        eps=EPS,
        atol=kw.pop("atol", 0.15),
        rtol=kw.pop("rtol", 0.15),
    )


@pytest.fixture(scope="module")
def pendulum():
    d = build_model_description(models.build_pendulum_urdf(2))
    return KinDynParameters.build(d)


@pytest.fixture(scope="module")
def humanoid_model():
    model = js.JaxSimModel.build_from_model_description(models.build_humanoid_urdf())
    return model.replace(
        contact_params=js.contact.estimate_good_contact_parameters(
            model,
            number_of_active_collidable_points_steady_state=8,
            max_penetration=0.006,
            damping_ratio=0.15,
        )
    )


def test_ad_aba(pendulum):
    kdp = pendulum

    def f(s, sd, tau):
        _, sdd = ops.aba(
            kdp,
            base_transform=jnp.eye(4),
            joint_positions=s,
            base_velocity_inertial=jnp.zeros(6),
            joint_velocities=sd,
            joint_forces=tau,
            floating_base=False,
        )
        return sdd

    check_grads(f, (jnp.array([0.4, -0.3]), jnp.array([0.2, 0.5]), jnp.array([1.0, -0.5])))


def test_ad_rnea(pendulum):
    kdp = pendulum

    def f(s, sd, sdd):
        _, tau = ops.rnea(
            kdp,
            base_transform=jnp.eye(4),
            joint_positions=s,
            base_velocity_inertial=jnp.zeros(6),
            joint_velocities=sd,
            joint_accelerations=sdd,
            floating_base=False,
        )
        return tau

    check_grads(
        f, (jnp.array([0.4, -0.3]), jnp.array([0.2, 0.5]), jnp.array([0.3, 0.1]))
    )


def test_ad_crba(pendulum):
    kdp = pendulum
    check_grads(lambda s: ops.crba(kdp, joint_positions=s), (jnp.array([0.4, -0.3]),))


def test_ad_fk(pendulum):
    kdp = pendulum

    def f(s):
        H, v = ops.forward_kinematics_model(
            kdp,
            base_transform=jnp.eye(4),
            joint_positions=s,
            base_velocity_inertial=jnp.zeros(6),
            joint_velocities=jnp.zeros(2),
        )
        return H

    check_grads(f, (jnp.array([0.4, -0.3]),))


def test_ad_jacobian(pendulum):
    kdp = pendulum
    check_grads(
        lambda s: ops.jacobian_full_doubly_left(kdp, joint_positions=s)[0],
        (jnp.array([0.4, -0.3]),),
    )


def test_ad_soft_contacts():
    from jaxsim_tpu.ops.contacts.soft import hunt_crossley_contact_model
    from jaxsim_tpu.terrain import FlatTerrain

    terrain = FlatTerrain.build()

    def f(pos, vel, m):
        fl, md = hunt_crossley_contact_model(
            pos, vel, m, terrain, 1e4, 100.0, 0.5
        )
        return fl

    # One penetrating point, interior of the sticking branch (penetration
    # far from 0 so FD perturbations don't flip branches).
    pos = jnp.array([[0.01, 0.02, -0.02]])
    vel = jnp.array([[0.003, -0.001, -0.05]])
    m = jnp.array([[0.0001, 0.00005, 0.0]])
    check_grads(f, (pos, vel, m), atol=0.2, rtol=0.2)


@pytest.mark.slow
def test_ad_full_step_torques(humanoid_model):
    """Gradient of a short rollout w.r.t. torques, vs finite differences."""
    model = humanoid_model
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.862]),
        joint_velocities=0.05 * jnp.ones(23),
    )

    def loss(tau):
        d = data
        for _ in range(3):
            d = js.model.step(model, d, joint_force_references=tau)
        return jnp.sum(d.joint_velocities**2)

    g = jax.jit(jax.grad(loss))(jnp.zeros(23))
    assert np.all(np.isfinite(np.asarray(g)))

    # Directional FD check.
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (23,))
    v = v / jnp.linalg.norm(v)
    eps = 1e-2
    fd = (loss(eps * v) - loss(-eps * v)) / (2 * eps)
    ad = jnp.dot(g, v)
    np.testing.assert_allclose(float(ad), float(fd), rtol=0.1, atol=1e-3)


def test_ad_hw_parameters():
    """Gradients flow through morphology scaling into dynamics
    (reference ``test_automatic_differentiation.py:467``; the reference
    exercises this on its small 'garpez' fixture, not the humanoid —
    matching that keeps the grad-of-generic-step compile small)."""
    from jaxsim_tpu.api import hw_parameters as hw

    model = hw.with_hw_metadata(
        js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    )
    nl = model.number_of_links()
    # Base corners in penetration: free-fall acceleration is mass-
    # independent, so the state must involve contact forces for morphology
    # gradients to be nonzero.
    data = js.JaxSimModelData.build(
        model, base_position=jnp.array([0.0, 0.0, -0.01])
    )

    def loss(scale):
        sf = hw.ScalingFactors(
            dims=jnp.tile(scale[:, None], (1, 3)), density=jnp.ones(nl)
        )
        m2 = hw.update_hw_parameters(model, sf)
        d = js.model.step(m2, data)
        return jnp.sum(d.base_linear_velocity_inertial**2)

    g = jax.jit(jax.grad(loss))(jnp.ones(nl))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_ad_batched_engine():
    """Reverse AD through the batch-minor engine rollout (small model —
    the humanoid's unrolled reverse graph takes minutes to compile)."""
    from jaxsim_tpu.ops.batched_engine import BatchedEngine

    small = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(small)
    st = eng.init_state(4)

    def loss(kp):
        out = eng.rollout(st, 3, policy=lambda s: -kp * s.s - 0.5 * s.sd)
        return jnp.sum(out.v**2)

    g = jax.jit(jax.grad(loss))(60.0)
    assert np.isfinite(float(g))
