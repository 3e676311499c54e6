"""API-level tests: representations, wrappers, consistency across VelRepr
(reference ``tests/test_api_model.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from tests.conftest import assert_allclose

ALL_REPRS = [js.VelRepr.Inertial, js.VelRepr.Body, js.VelRepr.Mixed]


@pytest.fixture(scope="module")
def humanoid_model():
    return js.JaxSimModel.build_from_model_description(models.build_humanoid_urdf())


@pytest.fixture(scope="module")
def humanoid_data(humanoid_model):
    return js.data.random_model_data(humanoid_model, key=jax.random.PRNGKey(7))


def with_repr(model, data, repr_):
    return data.replace(velocity_representation=repr_)


def test_model_creation_and_reduction(humanoid_model):
    model = humanoid_model
    assert model.number_of_links() == 24
    assert model.number_of_joints() == 23
    assert model.floating_base()

    legs = tuple(
        j for j in model.joint_names() if ("hip" in j or "knee" in j or "ankle" in j)
    )
    reduced = js.model.reduce(model, considered_joints=legs)
    assert reduced.number_of_joints() == 12
    assert_allclose(
        js.model.total_mass(reduced), js.model.total_mass(model), rtol=1e-5
    )

    # Reduction with locked positions shifts lumped inertias consistently.
    locked = {j: 0.3 for j in model.joint_names() if "elbow" in j}
    reduced2 = js.model.reduce(
        model, considered_joints=legs, locked_joint_positions=locked
    )
    assert_allclose(
        js.model.total_mass(reduced2), js.model.total_mass(model), rtol=1e-5
    )


def test_mass_matrix_representation_invariance(humanoid_model, humanoid_data):
    """νᵀ M ν (kinetic energy) is representation-invariant."""
    energies = []
    for repr_ in ALL_REPRS:
        d = with_repr(humanoid_model, humanoid_data, repr_)
        M = js.model.free_floating_mass_matrix(humanoid_model, d)
        nu = d.generalized_velocity
        energies.append(float(nu @ M @ nu))
    assert_allclose(energies[0], energies[1], rtol=1e-4)
    assert_allclose(energies[0], energies[2], rtol=1e-4)


def test_mass_matrix_inverse(humanoid_model, humanoid_data):
    for repr_ in ALL_REPRS:
        d = with_repr(humanoid_model, humanoid_data, repr_)
        M = js.model.free_floating_mass_matrix(humanoid_model, d)
        Minv = js.model.free_floating_mass_matrix_inverse(humanoid_model, d)
        assert_allclose(
            Minv @ M, jnp.eye(M.shape[0]), atol=2e-4,
            err_msg=f"repr={repr_}",
        )


def test_jacobian_times_nu_equals_link_velocity(humanoid_model, humanoid_data):
    """J_L ν == link velocity, in every (input, output) repr combination."""
    for repr_in in ALL_REPRS:
        d = with_repr(humanoid_model, humanoid_data, repr_in)
        nu = d.generalized_velocity
        for repr_out in ALL_REPRS:
            J = js.model.generalized_free_floating_jacobian(
                humanoid_model, d, output_vel_repr=repr_out
            )
            v_expected = jax.vmap(
                lambda i: js.link.velocity(
                    humanoid_model, d, link_index=i, output_vel_repr=repr_out
                )
            )(jnp.arange(humanoid_model.number_of_links()))
            v_J = jnp.einsum("lij,j->li", J, nu)
            assert_allclose(
                v_J, v_expected, rtol=2e-4, atol=2e-4,
                err_msg=f"in={repr_in} out={repr_out}",
            )


def test_bias_forces_match_crb_pipeline(humanoid_model, humanoid_data):
    """ABA == M⁻¹(τ + Jᵀf − h) in every representation."""
    key = jax.random.PRNGKey(3)
    tau = jax.random.normal(key, (humanoid_model.number_of_joints(),))
    f_L = 2.0 * jax.random.normal(key, (humanoid_model.number_of_links(), 6))

    for repr_ in ALL_REPRS:
        d = with_repr(humanoid_model, humanoid_data, repr_)
        a1, sdd1 = js.model.forward_dynamics_aba(
            humanoid_model, d, joint_forces=tau, link_forces=f_L
        )
        a2, sdd2 = js.model.forward_dynamics_crb(
            humanoid_model, d, joint_forces=tau, link_forces=f_L
        )
        assert_allclose(sdd1, sdd2, rtol=5e-3, atol=5e-3, err_msg=f"{repr_}")
        assert_allclose(a1, a2, rtol=5e-3, atol=5e-3, err_msg=f"{repr_}")


def test_inverse_of_forward_dynamics(humanoid_model, humanoid_data):
    """ID(FD(τ)) == τ in every representation."""
    key = jax.random.PRNGKey(4)
    tau = jax.random.normal(key, (humanoid_model.number_of_joints(),))

    for repr_ in ALL_REPRS:
        d = with_repr(humanoid_model, humanoid_data, repr_)
        a, sdd = js.model.forward_dynamics_aba(humanoid_model, d, joint_forces=tau)
        f_B, tau_back = js.model.inverse_dynamics(
            humanoid_model, d, joint_accelerations=sdd, base_acceleration=a
        )
        assert_allclose(tau_back, tau, rtol=2e-3, atol=2e-3, err_msg=f"{repr_}")
        assert_allclose(f_B, jnp.zeros(6), atol=5e-3, err_msg=f"{repr_}")


def test_coriolis_matrix(humanoid_model, humanoid_data):
    """C ν == h − g in every representation."""
    for repr_ in ALL_REPRS:
        d = with_repr(humanoid_model, humanoid_data, repr_)
        C = js.model.free_floating_coriolis_matrix(humanoid_model, d)
        h = js.model.free_floating_bias_forces(humanoid_model, d)
        g = js.model.free_floating_gravity_forces(humanoid_model, d)
        nu = d.generalized_velocity
        assert_allclose(C @ nu, h - g, rtol=5e-3, atol=5e-3, err_msg=f"{repr_}")


def test_coriolis_matrix_fixed_base():
    """Fixed-base models zero the base↔joint coupling blocks of C
    (reference ``api/model.py:1685-1693``), and C ν == h − g still holds
    on the joint block."""
    model = js.JaxSimModel.build_from_model_description(
        models.build_pendulum_urdf(num_links=2)
    )
    assert not model.floating_base()
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    data = js.JaxSimModelData.build(
        model,
        joint_positions=jax.random.uniform(k1, (model.number_of_joints(),)),
        joint_velocities=jax.random.normal(k2, (model.number_of_joints(),)),
    )
    for repr_ in ALL_REPRS:
        d = with_repr(model, data, repr_)
        C = js.model.free_floating_coriolis_matrix(model, d)
        assert_allclose(C[0:6, 6:], jnp.zeros_like(C[0:6, 6:]), err_msg=f"{repr_}")
        assert_allclose(C[6:, 0:6], jnp.zeros_like(C[6:, 0:6]), err_msg=f"{repr_}")
        h = js.model.free_floating_bias_forces(model, d)
        g = js.model.free_floating_gravity_forces(model, d)
        nu = d.generalized_velocity
        assert_allclose(
            (C @ nu)[6:], (h - g)[6:], rtol=5e-3, atol=5e-3, err_msg=f"{repr_}"
        )


def test_link_bias_acceleration_consistency(humanoid_model, humanoid_data):
    """J̇ν from the derivative wrapper matches an FD of J ν over time."""
    model, data = humanoid_model, humanoid_data
    for repr_ in ALL_REPRS:
        d = with_repr(model, data, repr_)
        Jd = js.model.generalized_free_floating_jacobian_derivative(model, d)
        assert np.all(np.isfinite(np.asarray(Jd)))


def test_momentum_and_com(humanoid_model, humanoid_data):
    model = humanoid_model
    m_tot = float(js.model.total_mass(model))
    assert m_tot > 0

    # CoM quantities are physical (representation-independent): sweep the
    # data's active representation and assert both internal consistency
    # and cross-representation invariance.
    ref_vals = {}
    for repr_ in ALL_REPRS:
        data = with_repr(model, humanoid_data, repr_)
        W_p_com = js.com.com_position(model, data)
        assert np.all(np.isfinite(np.asarray(W_p_com)))

        h_G = js.com.centroidal_momentum(model, data)
        v_com = js.com.com_linear_velocity(model, data)
        assert_allclose(h_G[0:3] / m_tot, v_com, rtol=1e-5)

        I_locked = js.com.locked_centroidal_spatial_inertia(model, data)
        v_avg = js.com.average_centroidal_velocity(model, data)
        assert_allclose(I_locked @ v_avg, h_G, rtol=1e-3, atol=1e-4)

        for name, val in (("p", W_p_com), ("h", h_G), ("v", v_com)):
            if name in ref_vals:
                assert_allclose(
                    val, ref_vals[name], rtol=1e-4, atol=1e-5,
                    err_msg=f"{name} in {repr_}",
                )
            else:
                ref_vals[name] = val


def test_total_momentum_jacobian_cross_representation(humanoid_model, humanoid_data):
    """J(output=O) @ nu_C equals the momentum evaluated directly in repr O."""
    model, data = humanoid_model, humanoid_data
    for repr_c in ALL_REPRS:
        d_c = with_repr(model, data, repr_c)
        nu_c = d_c.generalized_velocity
        for repr_o in ALL_REPRS:
            d_o = with_repr(model, data, repr_o)
            h_o = js.model.total_momentum(model, d_o)
            J = js.model.total_momentum_jacobian(model, d_c, output_vel_repr=repr_o)
            assert_allclose(
                J @ nu_c, h_o, rtol=1e-4, atol=1e-5, err_msg=f"{repr_c}->{repr_o}"
            )


def test_com_velocity_vs_finite_difference(humanoid_model):
    model = humanoid_model
    data = js.data.random_model_data(model, key=jax.random.PRNGKey(11))
    v_com = js.com.com_linear_velocity(model, data)

    eps = 1e-4
    from jaxsim_tpu.math import Quaternion

    q2 = Quaternion.integration(
        data.base_orientation,
        eps,
        data.base_angular_velocity_inertial,
        omega_in_body_fixed=False,
    )
    p2 = data.base_position + eps * (
        data.base_linear_velocity_inertial
        + jnp.cross(data.base_angular_velocity_inertial, data.base_position)
    )
    data2 = data.replace(
        model=model,
        base_position=p2,
        base_quaternion=q2,
        joint_positions=data.joint_positions + eps * data.joint_velocities,
    )
    com1 = js.com.com_position(model, data)
    com2 = js.com.com_position(model, data2)
    assert_allclose((com2 - com1) / eps, v_com, rtol=2e-2, atol=5e-3)


def test_frame_api(humanoid_model, humanoid_data):
    model, data = humanoid_model, humanoid_data
    assert model.number_of_frames() == 2
    for name in model.frame_names():
        idx = js.frame.name_to_idx(model, frame_name=name)
        assert js.frame.idx_to_name(model, frame_index=idx) == name
        W_H_F = js.frame.transform(model, data, frame_index=idx)
        assert np.all(np.isfinite(np.asarray(W_H_F)))
        # J ν == frame velocity for ALL (input repr, output repr) pairs —
        # the data's active representation changes ν AND the Jacobian's
        # input calculus (reference parametrizes every API test this way,
        # ``tests/conftest.py:127-143``).
        for repr_in in ALL_REPRS:
            d = with_repr(model, data, repr_in)
            nu = d.generalized_velocity
            for repr_out in ALL_REPRS:
                J = js.frame.jacobian(
                    model, d, frame_index=idx, output_vel_repr=repr_out
                )
                v = js.frame.velocity(
                    model, d, frame_index=idx, output_vel_repr=repr_out
                )
                assert_allclose(
                    J @ nu, v, rtol=1e-4, atol=1e-4,
                    err_msg=f"{name} {repr_in}->{repr_out}",
                )


def test_contact_jacobian_vs_point_velocity(humanoid_model, humanoid_data):
    model = humanoid_model
    _, W_pd_C = js.contact.collidable_point_kinematics(model, humanoid_data)
    for repr_in in ALL_REPRS:
        data = with_repr(model, humanoid_data, repr_in)
        J = js.contact.jacobian(model, data, output_vel_repr=js.VelRepr.Mixed)
        nu = data.generalized_velocity
        v_J = jnp.einsum("cij,j->ci", J, nu)[:, 0:3]
        assert_allclose(
            v_J, W_pd_C, rtol=1e-4, atol=1e-4, err_msg=str(repr_in)
        )


def test_no_retracing(humanoid_model):
    """Two models built from the same URDF share the JIT cache
    (reference ``tests/test_pytree.py:13``)."""
    import chex

    urdf = models.build_humanoid_urdf()
    m1 = js.JaxSimModel.build_from_model_description(urdf)
    m2 = js.JaxSimModel.build_from_model_description(urdf)
    assert hash(m1) == hash(m2)
    assert m1 == m2

    @jax.jit
    @chex.assert_max_traces(n=1)
    def f(model, data):
        return js.model.free_floating_mass_matrix(model, data)

    chex.clear_trace_counter()
    d1 = js.JaxSimModelData.build(m1)
    d2 = js.JaxSimModelData.build(m2)
    f(m1, d1)
    f(m2, d2)  # must not retrace


def test_reduced_model_kinematics_match_full(humanoid_model):
    """FK of a reduced model == FK of the full model with locked joints
    held at the lock values (reference ``test_api_model.py:16``)."""
    model = humanoid_model
    legs = tuple(
        j for j in model.joint_names() if ("hip" in j or "knee" in j or "ankle" in j)
    )
    locked = {j: 0.2 for j in model.joint_names() if j not in legs}
    reduced = js.model.reduce(
        model, considered_joints=legs, locked_joint_positions=locked
    )

    s_legs = 0.3 * jnp.ones(len(legs))
    d_red = js.JaxSimModelData.build(
        reduced, base_position=jnp.array([0.0, 0.0, 1.0]), joint_positions=s_legs
    )

    s_full = jnp.array(
        [0.3 if j in legs else 0.2 for j in model.joint_names()]
    )
    d_full = js.JaxSimModelData.build(
        model, base_position=jnp.array([0.0, 0.0, 1.0]), joint_positions=s_full
    )

    # Every link of the reduced model has a counterpart in the full model
    # with an identical world pose.
    full_names = model.link_names()
    for i, name in enumerate(reduced.link_names()):
        j = full_names.index(name)
        assert_allclose(
            d_red._link_transforms[i],
            d_full._link_transforms[j],
            atol=1e-5,
            err_msg=name,
        )

    # (Trajectory-level stability of reduced models is covered by the slow
    # tier; compiling a scan over the reduced-humanoid step costs ~30 s of
    # the default tier's single-core budget for no extra FK coverage.)


# ----------------------------------------------------------------------
# Real-robot-class asset: ergocub_like.urdf (29 DoF, deep fixed chains)
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def ergocub_model():
    import pathlib

    urdf = (
        pathlib.Path(__file__).parent / "assets" / "ergocub_like.urdf"
    ).read_text()
    return js.JaxSimModel.build_from_model_description(urdf)


# 23 locomotion DoF (torso + shoulders/elbows + legs), as in the
# reference's ErgoCub-reduced fixture.
LOCOMOTION_JOINTS = (
    "torso_pitch", "torso_roll", "torso_yaw",
    "l_shoulder_pitch", "l_shoulder_roll", "l_shoulder_yaw", "l_elbow",
    "r_shoulder_pitch", "r_shoulder_roll", "r_shoulder_yaw", "r_elbow",
    "l_hip_pitch", "l_hip_roll", "l_hip_yaw", "l_knee",
    "l_ankle_pitch", "l_ankle_roll",
    "r_hip_pitch", "r_hip_roll", "r_hip_yaw", "r_knee",
    "r_ankle_pitch", "r_ankle_roll",
)


def test_ergocub_creation(ergocub_model):
    """The vendored real-robot-class URDF parses with its full structure:
    32 revolute DoF, massless fixed-attached links become frames
    (sole/ft-sensor/camera chains of depth 2-3), limits and friction
    populated from the URDF."""
    model = ergocub_model
    assert model.number_of_joints() == 32
    assert model.floating_base()
    frames = set(model.frame_names())
    for f in (
        "l_sole", "r_sole", "l_foot_ft_sensor", "r_foot_ft_sensor",
        "imu_frame", "chest_imu", "head_cam_mount", "head_cam_optical",
        "l_hand_palm", "r_hand_palm",
    ):
        assert f in frames, f
    assert 25.0 < float(js.model.total_mass(model)) < 45.0

    # Depth-2 fixed chain: the sole frame pose composes BOTH fixed joints
    # (foot -> ft_sensor -> sole, each with a rotated origin).
    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.8]))
    idx = js.frame.name_to_idx(model, frame_name="l_sole")
    W_H_sole = js.frame.transform(model, data, frame_index=idx)
    # Two successive yaw-pi rotations cancel: sole axes align with foot.
    assert_allclose(W_H_sole[:3, :3] @ W_H_sole[:3, :3].T, jnp.eye(3), atol=1e-6)
    # z offset: foot anchor -0.04 relative to ankle_1 then -0.03 - 0.01.
    assert float(W_H_sole[2, 3]) < 0.8 - 0.05

    # Joint limits arrived from the URDF (knee is one-sided).
    lo, hi = js.joint.position_limit(
        model, joint_index=js.joint.name_to_idx(model, joint_name="l_knee")
    )
    assert float(lo) == -2.0 and float(hi) == 0.0


def test_ergocub_reduction_to_locomotion(ergocub_model):
    """Reduce 32 -> 23 locomotion DoF (reference ErgoCub-reduced pattern):
    mass preserved, wrist/neck links lumped, frames re-parented, FK of
    common links identical with locked joints at their lock values."""
    model = ergocub_model
    reduced = js.model.reduce(
        model,
        considered_joints=LOCOMOTION_JOINTS,
        locked_joint_positions={
            j: 0.1 for j in model.joint_names() if j not in LOCOMOTION_JOINTS
        },
    )
    assert reduced.number_of_joints() == 23
    assert_allclose(
        js.model.total_mass(reduced), js.model.total_mass(model), rtol=1e-5
    )
    # Frames survive reduction (possibly re-parented to lumped links).
    for f in ("l_sole", "r_sole", "head_cam_optical"):
        assert f in reduced.frame_names(), f

    s23 = 0.15 * jnp.ones(23)
    d_red = js.JaxSimModelData.build(
        reduced, base_position=jnp.array([0.0, 0.0, 0.8]), joint_positions=s23
    )
    s_full = jnp.array(
        [0.15 if j in LOCOMOTION_JOINTS else 0.1 for j in model.joint_names()]
    )
    d_full = js.JaxSimModelData.build(
        model, base_position=jnp.array([0.0, 0.0, 0.8]), joint_positions=s_full
    )
    full_names = model.link_names()
    for i, name in enumerate(reduced.link_names()):
        j = full_names.index(name)
        assert_allclose(
            d_red._link_transforms[i], d_full._link_transforms[j],
            atol=1e-5, err_msg=name,
        )
    # The sole frame agrees between full and reduced models too.
    for fname in ("l_sole", "r_sole"):
        Hr = js.frame.transform(
            reduced, d_red,
            frame_index=js.frame.name_to_idx(reduced, frame_name=fname),
        )
        Hf = js.frame.transform(
            model, d_full,
            frame_index=js.frame.name_to_idx(model, frame_name=fname),
        )
        assert_allclose(Hr, Hf, atol=1e-5, err_msg=fname)


def test_ergocub_dynamics_consistency(ergocub_model):
    """FD∘ID identity on the real-robot-class model (mesh-free but
    realistically parameterized)."""
    model = ergocub_model
    data = js.data.random_model_data(model, key=jax.random.PRNGKey(11))
    n = model.number_of_joints()
    tau = 0.5 * jax.random.normal(jax.random.PRNGKey(12), (n,))

    vd, sdd = js.model.forward_dynamics_aba(model, data, joint_forces=tau)
    f_B, tau_id = js.model.inverse_dynamics(
        model, data, base_acceleration=vd, joint_accelerations=sdd
    )
    assert_allclose(tau_id, tau, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_ergocub_rollout_stable(ergocub_model):
    """Short stable soft-contact trajectory on the 29-DoF real-robot-class
    model (slow: compiling the scan over the generic 29-DoF step takes
    ~a minute on one core; trajectory-level engine-vs-generic coverage
    lives in test_batched_engine)."""
    model = ergocub_model
    d0 = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.76]))

    @jax.jit
    def run(d):
        def body(d, _):
            tau_pd = -80.0 * d.joint_positions - 1.0 * d.joint_velocities
            return js.model.step(model, d, joint_force_references=tau_pd), None

        out, _ = jax.lax.scan(body, d, None, length=100)
        return out

    out = run(d0)
    assert np.all(np.isfinite(np.asarray(out.base_position)))
    assert float(out.base_position[2]) > 0.3


# ----- step backend auto-dispatch (round 3) -----


def test_step_backend_auto_matches_generic(humanoid_model):
    """backend="auto" (default) routes js.model.step through the
    BatchedEngine fast path; trajectories match the generic path (tier T).
    Reference-style user code gets engine speed with no code change."""
    from jaxsim_tpu.api.model import _resolve_step_engine

    assert humanoid_model.backend == "auto"

    # The stepped equivalence runs on garpez: dispatch mechanics are
    # morphology-independent, and the generic humanoid step is the single
    # most expensive compile in the suite on a single-core box.
    m_auto = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    assert _resolve_step_engine(m_auto, None) is not None
    m_gen = js.JaxSimModel.build_from_model_description(
        models.build_garpez_urdf(), backend="generic"
    )
    assert _resolve_step_engine(m_gen, None) is None

    def mk(m):
        return js.JaxSimModelData.build(
            m,
            base_position=jnp.array([0.0, 0.0, 0.35]),
            joint_positions=0.05 * jnp.ones(m.number_of_joints()),
        )

    da, dg = mk(m_auto), mk(m_gen)
    tau = 0.1 * jnp.ones(m_auto.number_of_joints())
    step_a = jax.jit(
        lambda d: js.model.step(m_auto, d, joint_force_references=tau)
    )
    step_g = jax.jit(lambda d: js.model.step(m_gen, d, joint_force_references=tau))
    for _ in range(10):
        da = step_a(da)
        dg = step_g(dg)
    assert_allclose(da.base_position, dg.base_position, rtol=1e-4, atol=1e-5)
    assert_allclose(da.joint_positions, dg.joint_positions, rtol=1e-4, atol=1e-5)
    assert_allclose(
        da.base_linear_velocity_inertial,
        dg.base_linear_velocity_inertial,
        rtol=1e-3,
        atol=1e-4,
    )
    # Velocity representation survives the engine round-trip.
    assert da.velocity_representation == dg.velocity_representation


def test_step_backend_fallback_and_engine_strict():
    """Out-of-envelope configs fall back to the generic path under "auto"
    and raise under backend="engine"; external link forces always use the
    generic path."""
    from jaxsim_tpu.api.model import _resolve_step_engine
    from jaxsim_tpu.terrain import HeightmapTerrain

    model = js.JaxSimModel.build_from_model_description(models.build_box_urdf())
    # External link forces: generic path.
    assert _resolve_step_engine(model, jnp.zeros((1, 6))) is None
    # In-envelope, no forces: engine.
    assert _resolve_step_engine(model, None) is not None

    # backend="engine" with external forces raises.
    m_strict = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(), backend="engine"
    )
    with pytest.raises(ValueError, match="engine"):
        _resolve_step_engine(m_strict, jnp.zeros((1, 6)))

    # Heightmap terrain is inside the XLA-engine envelope since round 3.
    m_h = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(),
        terrain=HeightmapTerrain.build(
            heights=np.zeros((4, 4)), extent=(-2, 2, -2, 2)
        ),
    )
    assert _resolve_step_engine(m_h, None) is not None

    with pytest.raises(ValueError, match="backend"):
        js.JaxSimModel.build_from_model_description(
            models.build_box_urdf(), backend="nope"
        )
