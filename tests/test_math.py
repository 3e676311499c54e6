"""Spatial-math unit tests (scipy as oracle for rotations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.spatial.transform as st

from jaxsim_tpu import math
from tests.conftest import assert_allclose


def random_quat(key, batch=()):
    q = jax.random.normal(key, batch + (4,))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_skew_wedge_vee():
    v = jnp.array([1.0, -2.0, 3.0])
    S = math.Skew.wedge(v)
    assert_allclose(S, -S.T)
    assert_allclose(math.Skew.vee(S), v)
    # cross product property
    u = jnp.array([0.3, 0.1, -0.5])
    assert_allclose(S @ u, jnp.cross(v, u))
    # batched
    vb = jnp.tile(v, (4, 2, 1))
    assert math.Skew.wedge(vb).shape == (4, 2, 3, 3)


def test_quaternion_dcm_roundtrip(prng_key):
    q = random_quat(prng_key, (32,))
    R = math.Quaternion.to_dcm(q)
    R_scipy = st.Rotation.from_quat(np.asarray(math.Quaternion.to_xyzw(q))).as_matrix()
    assert_allclose(R, R_scipy, rtol=1e-5, atol=1e-5)
    q2 = math.Quaternion.from_dcm(R)
    # q and q2 equal up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    assert_allclose(dot, jnp.ones_like(dot), atol=1e-5)


def test_quaternion_product(prng_key):
    k1, k2 = jax.random.split(prng_key)
    q1, q2 = random_quat(k1, (8,)), random_quat(k2, (8,))
    q12 = math.Quaternion.product(q1, q2)
    R12 = math.Quaternion.to_dcm(q12)
    assert_allclose(
        R12,
        math.Quaternion.to_dcm(q1) @ math.Quaternion.to_dcm(q2),
        rtol=1e-4,
        atol=1e-5,
    )


def test_rotation_axis_angle(prng_key):
    v = jax.random.normal(prng_key, (16, 3))
    R = math.Rotation.from_axis_angle(v)
    R_scipy = st.Rotation.from_rotvec(np.asarray(v)).as_matrix()
    assert_allclose(R, R_scipy, rtol=1e-5, atol=1e-5)
    # zero input → identity, and AD-safe gradient (finite everywhere)
    assert_allclose(math.Rotation.from_axis_angle(jnp.zeros(3)), jnp.eye(3))
    g = jax.jacfwd(math.Rotation.from_axis_angle)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quaternion_exp_log(prng_key):
    w = 0.5 * jax.random.normal(prng_key, (8, 3))
    assert_allclose(math.Quaternion.log(math.Quaternion.exp(w)), w, atol=1e-5)


def test_transform_adjoint_consistency(prng_key):
    k1, k2 = jax.random.split(prng_key)
    q = random_quat(k1)
    p = jax.random.normal(k2, (3,))
    H = math.Transform.from_quaternion_and_translation(q, p)
    Hi = math.Transform.inverse(H)
    assert_allclose(H @ Hi, jnp.eye(4), atol=1e-5)

    X = math.Adjoint.from_transform(H)
    Xi = math.Adjoint.from_transform(H, inverse=True)
    assert_allclose(X @ Xi, jnp.eye(6), atol=1e-5)
    assert_allclose(math.Adjoint.inverse(X), Xi, atol=1e-5)
    assert_allclose(math.Adjoint.to_transform(X), H, atol=1e-5)

    # composition: Ad(H1 H2) = Ad(H1) Ad(H2)
    H2 = math.Transform.from_quaternion_and_translation(
        random_quat(k2), jax.random.normal(k1, (3,))
    )
    assert_allclose(
        math.Adjoint.from_transform(H @ H2),
        X @ math.Adjoint.from_transform(H2),
        rtol=1e-4,
        atol=1e-5,
    )


def test_cross_products(prng_key):
    v = jax.random.normal(prng_key, (6,))
    vx = math.Cross.vx(v)
    vxs = math.Cross.vx_star(v)
    assert_allclose(vxs, -vx.T)
    # Lie bracket property: (v×)w = -(w×)v for motion vectors
    w = jax.random.normal(jax.random.split(prng_key)[0], (6,))
    assert_allclose(vx @ w, -math.Cross.vx(w) @ v, rtol=1e-4, atol=1e-5)


def test_inertia_roundtrip():
    m = 2.5
    c = jnp.array([0.1, -0.2, 0.05])
    I_com = jnp.diag(jnp.array([0.4, 0.5, 0.6]))
    cw = math.Skew.wedge(c)
    I_link = I_com + m * cw @ cw.T
    M = math.Inertia.to_sixd(m, c, I_link)
    m2, c2, I2 = math.Inertia.to_params(M)
    assert_allclose(m2, m)
    assert_allclose(c2, c, atol=1e-6)
    assert_allclose(I2, I_link, atol=1e-5)


def test_safe_norm_gradient():
    g = jax.grad(lambda x: math.safe_norm(x))(jnp.zeros(3))
    assert_allclose(g, jnp.zeros(3))
    g1 = jax.grad(lambda x: math.safe_norm(x))(jnp.array([3.0, 4.0, 0.0]))
    assert_allclose(g1, jnp.array([0.6, 0.8, 0.0]))


def test_quaternion_derivative_matches_manifold(prng_key):
    q = random_quat(prng_key)
    w = jnp.array([0.3, -0.2, 0.5])
    for body in (True, False):
        qd = math.Quaternion.derivative(q, w, omega_in_body_fixed=body)
        dt = 1e-3
        qi = math.Quaternion.integration(q, dt, w, omega_in_body_fixed=body)
        fd = (qi - q) / dt
        assert_allclose(fd, qd, rtol=0, atol=5e-3)


def test_supported_joint_motion():
    types = jnp.array([1, 2, 0])
    s = jnp.array([0.5, 0.2, 0.7])
    axes = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    H = math.supported_joint_motion(types, s, axes)
    assert H.shape == (3, 4, 4)
    assert_allclose(H[0, :3, :3], math.Rotation.z(jnp.array(0.5)), atol=1e-6)
    assert_allclose(H[0, :3, 3], jnp.zeros(3))
    assert_allclose(H[1, :3, :3], jnp.eye(3))
    assert_allclose(H[1, :3, 3], jnp.array([0.2, 0.0, 0.0]))
    assert_allclose(H[2], jnp.eye(4))
    # batched joint positions
    sb = jnp.tile(s, (5, 1))
    Hb = math.supported_joint_motion(types, sb, axes)
    assert Hb.shape == (5, 3, 4, 4)
    assert_allclose(Hb[3], H, atol=1e-6)
