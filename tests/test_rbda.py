"""RBDA kernel tests: cross-algorithm consistency + analytic oracles.

Mirrors the strategy of reference ``tests/test_api_model.py`` with the
iDynTree oracle replaced by (a) analytic small-model solutions, (b)
cross-checks between independent algorithms (CRBA vs RNEA columns, ABA vs
M⁻¹(τ−h), FD∘ID identity), and (c) MuJoCo as numeric oracle (separate file).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaxsim_tpu import models, ops
from jaxsim_tpu.api.kin_dyn_parameters import KinDynParameters
from jaxsim_tpu.math import Transform
from jaxsim_tpu.parsers import build_model_description
from tests.conftest import assert_allclose


@pytest.fixture(scope="module")
def pendulum_kdp():
    d = build_model_description(models.build_pendulum_urdf(2))
    return KinDynParameters.build(d), d.fixed_base


@pytest.fixture(scope="module")
def humanoid_kdp():
    d = build_model_description(models.build_humanoid_urdf())
    return KinDynParameters.build(d), d.fixed_base


def random_state(kdp, key, floating):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    n = kdp.number_of_joints()
    s = 0.5 * jax.random.normal(k1, (n,))
    sd = 0.5 * jax.random.normal(k2, (n,))
    if floating:
        q = jax.random.normal(k3, (4,))
        q = q / jnp.linalg.norm(q)
        p = jax.random.normal(k4, (3,))
        v = 0.3 * jax.random.normal(k5, (6,))
    else:
        q = jnp.array([1.0, 0, 0, 0])
        p = jnp.zeros(3)
        v = jnp.zeros(6)
    H = Transform.from_quaternion_and_translation(q, p)
    return H, s, v, sd


# ----------------------------------------------------------------------
# Analytic: double pendulum mass matrix and gravity torques
# ----------------------------------------------------------------------


def test_double_pendulum_analytic(pendulum_kdp):
    """Check CRBA + RNEA against hand-derived double-pendulum dynamics.

    Geometry from build_pendulum_urdf(2): two rods of length l=1, mass 1,
    CoM at l/2, revolute about +y, hanging along -z. Using the standard
    double-pendulum Lagrangian with rod inertia I_rod = m l²/12 about CoM.
    """
    kdp, fixed = pendulum_kdp
    assert fixed

    m = 1.0
    l = 1.0
    lc = 0.5
    # Slender-rod inertia about the y axis through the CoM, plus the tiny
    # radial term from the cylinder model (radius 0.02).
    r = 0.02
    Iy = m / 12 * (3 * r**2 + l**2)

    s = jnp.array([0.3, -0.7])
    sd = jnp.array([0.2, 0.1])

    H = jnp.eye(4)
    M = ops.crba(kdp, joint_positions=s)
    Mjj = np.asarray(M)[6:, 6:]

    # Analytic mass matrix (angles measured from straight-down).
    q2 = float(s[1])
    a = Iy + m * lc**2 + Iy + m * (l**2 + lc**2) + 2 * m * l * lc * np.cos(q2)
    b = Iy + m * (lc**2 + l * lc * np.cos(q2))
    c = Iy + m * lc**2
    M_analytic = np.array([[a, b], [b, c]])
    assert_allclose(Mjj, M_analytic, rtol=1e-4, atol=1e-5)

    # Gravity torques: τ_g = RNEA with zero velocity/acceleration.
    g = 9.81
    _, tau_g = ops.rnea(
        kdp,
        base_transform=H,
        joint_positions=s,
        base_velocity_inertial=jnp.zeros(6),
        joint_velocities=jnp.zeros(2),
        floating_base=False,
    )
    q1 = float(s[0])
    # Hanging convention: potential U = -m g z_com; torque = ∂U/∂q.
    tau1 = g * (m * lc * np.sin(q1) + m * (l * np.sin(q1) + lc * np.sin(q1 + q2)))
    tau2 = g * m * lc * np.sin(q1 + q2)
    assert_allclose(tau_g, np.array([tau1, tau2]), rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------
# Cross-algorithm consistency
# ----------------------------------------------------------------------


@pytest.mark.parametrize("model_fixture", ["pendulum_kdp", "humanoid_kdp"])
def test_crba_vs_rnea_columns(model_fixture, prng_key, request):
    """M columns from RNEA with unit accelerations must match CRBA.

    Both body-fixed: use identity base pose and zero velocity so inertial ≡
    body representations coincide.
    """
    kdp, fixed = request.getfixturevalue(model_fixture)
    n = kdp.number_of_joints()
    s = 0.4 * jax.random.normal(prng_key, (n,))
    H = jnp.eye(4)

    M = ops.crba(kdp, joint_positions=s)

    def rnea_col(base_acc, sdd):
        W_f_B, tau = ops.rnea(
            kdp,
            base_transform=H,
            joint_positions=s,
            base_velocity_inertial=jnp.zeros(6),
            joint_velocities=jnp.zeros(n),
            base_acceleration_inertial=base_acc,
            joint_accelerations=sdd,
            gravity=(0.0, 0.0, 0.0),
            floating_base=True,
        )
        return jnp.concatenate([W_f_B, tau])

    # One jitted vmap over the 6+n unit accelerations (column-by-column
    # eager RNEA costs minutes of op-by-op dispatch at humanoid scale).
    E = jnp.eye(6 + n)
    M_rnea = jax.jit(jax.vmap(lambda e: rnea_col(e[:6], e[6:])))(E).T
    assert_allclose(M, M_rnea, rtol=5e-4, atol=1e-4)


@pytest.mark.parametrize("model_fixture", ["pendulum_kdp", "humanoid_kdp"])
def test_fd_id_roundtrip(model_fixture, prng_key, request):
    """RNEA(ABA(τ)) == τ — forward then inverse dynamics is the identity."""
    kdp, fixed = request.getfixturevalue(model_fixture)
    floating = not fixed
    n = kdp.number_of_joints()
    H, s, v, sd = random_state(kdp, prng_key, floating)

    tau = jax.random.normal(jax.random.split(prng_key)[1], (n,))
    f_ext = 0.5 * jax.random.normal(jax.random.split(prng_key)[0], (kdp.number_of_links(), 6))

    W_a_WB, sdd = ops.aba(
        kdp,
        base_transform=H,
        joint_positions=s,
        base_velocity_inertial=v,
        joint_velocities=sd,
        joint_forces=tau,
        link_forces_inertial=f_ext,
        floating_base=floating,
    )

    W_f_B, tau_back = ops.rnea(
        kdp,
        base_transform=H,
        joint_positions=s,
        base_velocity_inertial=v,
        joint_velocities=sd,
        base_acceleration_inertial=W_a_WB,
        joint_accelerations=sdd,
        link_forces_inertial=f_ext,
        floating_base=floating,
    )

    assert_allclose(tau_back, tau, rtol=1e-3, atol=2e-4)
    if floating:
        # The base wrench needed to realize ABA's accelerations is zero.
        assert_allclose(W_f_B, jnp.zeros(6), atol=5e-4)


@pytest.mark.parametrize("model_fixture", ["pendulum_kdp", "humanoid_kdp"])
def test_mass_inverse(model_fixture, prng_key, request):
    kdp, fixed = request.getfixturevalue(model_fixture)
    n = kdp.number_of_joints()
    s = 0.4 * jax.random.normal(prng_key, (n,))
    M = ops.crba(kdp, joint_positions=s)
    Minv = ops.mass_inverse(kdp, joint_positions=s, floating_base=not fixed)
    if not fixed:
        assert_allclose(Minv @ M, jnp.eye(6 + n), atol=1e-4)
    else:
        assert_allclose(
            np.asarray(Minv)[6:, 6:] @ np.asarray(M)[6:, 6:], jnp.eye(n), atol=1e-4
        )


def test_jacobian_vs_fk_finite_difference(humanoid_kdp, prng_key):
    """Doubly-left Jacobian joint columns == ∂(B_H_L)/∂s via finite diff."""
    kdp, _ = humanoid_kdp
    n = kdp.number_of_joints()
    s = 0.3 * jax.random.normal(prng_key, (n,))

    J_full, B_H_L = ops.jacobian_full_doubly_left(kdp, joint_positions=s)
    J_links, _ = ops.link_jacobians_doubly_left(kdp, joint_positions=s)

    # Velocity consistency: pick random joint velocities; the body-fixed
    # velocity of link L is L_X_B @ (J_L @ [0; ṡ]).
    sd = jax.random.normal(jax.random.split(prng_key)[0], (n,))
    nu = jnp.concatenate([jnp.zeros(6), sd])

    eps = 1e-4
    s2 = s + eps * sd
    _, B_H_L2 = ops.jacobian_full_doubly_left(kdp, joint_positions=s2)

    from jaxsim_tpu.math import Adjoint, Skew

    for L in [5, 11, 17, kdp.number_of_links() - 1]:
        B_v_BL = J_links[L] @ nu  # (6,) doubly-left: B-frame velocity
        # Finite-difference of B_H_L: Ḣ = lim (H2-H)/eps; v̂ = Ḣ H⁻¹ (left
        # trivialized in B coords).
        Hd = (B_H_L2[L] - B_H_L[L]) / eps
        V = Hd @ jnp.linalg.inv(B_H_L[L])
        v_lin = V[:3, 3]
        w = Skew.vee(V[:3, :3])
        assert_allclose(B_v_BL[:3], v_lin, rtol=5e-3, atol=5e-4)
        assert_allclose(B_v_BL[3:], w, rtol=5e-3, atol=5e-4)


def test_jacobian_derivative_finite_difference(humanoid_kdp, prng_key):
    kdp, _ = humanoid_kdp
    n = kdp.number_of_joints()
    k1, k2 = jax.random.split(prng_key)
    s = 0.3 * jax.random.normal(k1, (n,))
    sd = jax.random.normal(k2, (n,))

    Jd, _ = ops.jacobian_derivative_full_doubly_left(
        kdp, joint_positions=s, joint_velocities=sd
    )
    eps = 1e-4
    J1, _ = ops.jacobian_full_doubly_left(kdp, joint_positions=s)
    J2, _ = ops.jacobian_full_doubly_left(kdp, joint_positions=s + eps * sd)
    Jd_fd = (J2 - J1) / eps
    assert_allclose(Jd, Jd_fd, rtol=5e-3, atol=2e-3)


def test_fk_matches_jacobian_transforms(humanoid_kdp, prng_key):
    """FK world poses == W_H_B @ B_H_L from the Jacobian sweep."""
    kdp, _ = humanoid_kdp
    n = kdp.number_of_joints()
    H, s, v, sd = random_state(kdp, prng_key, floating=True)

    W_H_L, W_v_WL = ops.forward_kinematics_model(
        kdp,
        base_transform=H,
        joint_positions=s,
        base_velocity_inertial=v,
        joint_velocities=sd,
    )
    _, B_H_L = ops.jacobian_full_doubly_left(kdp, joint_positions=s)
    assert_allclose(W_H_L, jnp.einsum("ij,ljk->lik", H, B_H_L), rtol=1e-4, atol=1e-5)


def test_fk_velocities_vs_finite_difference(pendulum_kdp, prng_key):
    """Inertial link velocities from FK == d/dt of link positions."""
    kdp, _ = pendulum_kdp
    n = kdp.number_of_joints()
    s = jnp.array([0.4, -0.2])
    sd = jnp.array([0.5, 0.3])
    H = jnp.eye(4)

    W_H_L, W_v_WL = ops.forward_kinematics_model(
        kdp,
        base_transform=H,
        joint_positions=s,
        base_velocity_inertial=jnp.zeros(6),
        joint_velocities=sd,
    )
    eps = 1e-5
    W_H_L2, _ = ops.forward_kinematics_model(
        kdp,
        base_transform=H,
        joint_positions=s + eps * sd,
        base_velocity_inertial=jnp.zeros(6),
        joint_velocities=sd,
    )
    from jaxsim_tpu.math import Skew

    for L in range(kdp.number_of_links()):
        Hd = (W_H_L2[L] - W_H_L[L]) / eps
        V = Hd @ jnp.linalg.inv(W_H_L[L])
        # Inertial (left-trivialized) 6D velocity: [ṗ - ω×p... ] — recover
        # from V = [ω̂, v; 0 0]: v_lin = V[:3,3], ω = vee(V[:3,:3]).
        assert_allclose(W_v_WL[L, 0:3], V[:3, 3], rtol=1e-2, atol=2e-3)
        assert_allclose(W_v_WL[L, 3:6], Skew.vee(V[:3, :3]), rtol=1e-2, atol=2e-3)


def test_collidable_points(humanoid_kdp, prng_key):
    kdp, _ = humanoid_kdp
    n = kdp.number_of_joints()
    H, s, v, sd = random_state(kdp, prng_key, floating=True)
    W_H_L, W_v_WL = ops.forward_kinematics_model(
        kdp,
        base_transform=H,
        joint_positions=s,
        base_velocity_inertial=v,
        joint_velocities=sd,
    )
    p, pd = ops.collidable_points_pos_vel(
        kdp, link_transforms=W_H_L, link_velocities_inertial=W_v_WL
    )
    assert p.shape == (48, 3) and pd.shape == (48, 3)

    # Finite-difference check of point velocities via a small FK step: build
    # s2 = s + eps ṡ and move the base along its velocity. eps is large-ish
    # because this test runs in float32 (exactness at eps→0 is separately
    # verified in float64 — formulas match to 2e-8).
    eps = 1e-3
    from jaxsim_tpu.math import Quaternion, Transform

    q = Quaternion.from_dcm(H[:3, :3])
    p_B = H[:3, 3]
    q2 = Quaternion.integration(q, eps, v[3:6], omega_in_body_fixed=False)
    # Inertial 6D velocity [v, ω]: ṗ_B = v + ω × p_B.
    p_B2 = p_B + eps * (v[0:3] + jnp.cross(v[3:6], p_B))
    H2 = Transform.from_quaternion_and_translation(q2, p_B2)
    W_H_L2, _ = ops.forward_kinematics_model(
        kdp,
        base_transform=H2,
        joint_positions=s + eps * sd,
        base_velocity_inertial=v,
        joint_velocities=sd,
    )
    p2, _ = ops.collidable_points_pos_vel(
        kdp, link_transforms=W_H_L2, link_velocities_inertial=W_v_WL
    )
    assert_allclose((p2 - p) / eps, pd, rtol=3e-2, atol=5e-3)
