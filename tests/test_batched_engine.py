"""Batch-minor engine equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models, ops
from jaxsim_tpu.ops.batched_engine import BatchedEngine
from tests.conftest import assert_allclose


def _generic(model):
    """The model forced onto the reference (generic) step path: since
    backend="auto" routes js.model.step through the engine, equivalence
    tests would otherwise compare the engine with itself."""
    return model.replace(backend="generic")


@pytest.fixture(scope="module")
def setup():
    model = js.JaxSimModel.build_from_model_description(models.build_humanoid_urdf())
    model = model.replace(
        contact_params=js.contact.estimate_good_contact_parameters(
            model,
            number_of_active_collidable_points_steady_state=8,
            max_penetration=0.006,
            damping_ratio=0.15,
        )
    )
    eng = BatchedEngine.build(model)
    B = 4
    key = jax.random.PRNGKey(0)
    datas = jax.vmap(
        lambda k: js.JaxSimModelData.build(
            model,
            base_position=jnp.array([0.0, 0.0, 0.86])
            + 0.01 * jax.random.normal(k, (3,)),
            joint_positions=0.1 * jax.random.normal(k, (23,)),
            joint_velocities=0.1
            * jax.random.normal(jax.random.split(k)[0], (23,)),
            velocity_representation=js.VelRepr.Inertial,
        )
    )(jax.random.split(key, B))
    return model, eng, datas


def test_fk_equivalence(setup):
    model, eng, datas = setup
    st = eng.state_from_data(datas)
    W_R, W_p, W_v = eng.fk(st)
    p_stack = jnp.stack([jnp.moveaxis(p, -1, 0) for p in W_p], 1)
    R_stack = jnp.stack([jnp.moveaxis(R, -1, 0) for R in W_R], 1)
    v_stack = jnp.stack([jnp.moveaxis(v, -1, 0) for v in W_v], 1)
    assert_allclose(p_stack, datas._link_transforms[:, :, :3, 3], atol=1e-5)
    assert_allclose(R_stack, datas._link_transforms[:, :, :3, :3], atol=1e-5)
    assert_allclose(v_stack, datas._link_velocities, atol=1e-5)


def test_aba_equivalence_with_forces(setup):
    model, eng, datas = setup
    data = jax.tree.map(lambda x: x[0], datas)
    data = data.update_cache(model)
    f_ext = jax.random.normal(jax.random.PRNGKey(3), (24, 6))

    Wa_ref, sdd_ref = ops.aba(
        model.kin_dyn_parameters,
        base_transform=data._base_transform,
        joint_positions=data.joint_positions,
        base_velocity_inertial=jnp.concatenate(
            [data.base_linear_velocity_inertial, data.base_angular_velocity_inertial]
        ),
        joint_velocities=data.joint_velocities,
        link_forces_inertial=f_ext,
        floating_base=True,
    )
    st = eng.state_from_data(jax.tree.map(lambda x: x[None], data))
    W_R, W_p, W_v = eng.fk(st)
    fl = [f_ext[i][:, None] for i in range(24)]
    Wa_b, sdd_b = eng.aba(st, W_R, W_p, W_v, fl, jnp.zeros((23, 1)))
    assert_allclose(sdd_b[:, 0], sdd_ref, rtol=1e-3, atol=1e-3)
    assert_allclose(Wa_b[:, 0], Wa_ref, rtol=1e-3, atol=1e-3)


def test_contact_equivalence(setup):
    model, eng, datas = setup
    data = jax.tree.map(lambda x: x[0], datas)
    data = data.update_cache(model)
    W_f_ref, _ = js.contact.link_contact_forces(model, data)

    st = eng.state_from_data(jax.tree.map(lambda x: x[None], data))
    W_R, W_p, W_v = eng.fk(st)
    fl, md = eng.soft_contact_forces(W_R, W_p, W_v, st.m)
    fl_full = jnp.stack(
        [f[:, 0] if f is not None else jnp.zeros(6) for f in fl]
    )
    assert_allclose(fl_full, W_f_ref, rtol=1e-4, atol=1e-2)


@pytest.mark.slow
def test_trajectory_equivalence(setup):
    """20 steps of the full step agree with the reference path (humanoid —
    compiling the vmap'd generic humanoid step takes ~a minute on one
    core, so the default tier runs the garpez twin below instead)."""
    model, eng, datas = setup
    tau_fn = lambda s, sd: -60.0 * s - 0.5 * sd
    step_ref = jax.jit(
        jax.vmap(
            lambda d: js.model.step(
                _generic(model),
                d,
                joint_force_references=tau_fn(d.joint_positions, d.joint_velocities),
            )
        )
    )
    step_b = jax.jit(lambda st: eng.step(st, tau_fn(st.s, st.sd)))

    d = datas
    st = eng.state_from_data(datas)
    for _ in range(20):
        d = step_ref(d)
        st = step_b(st)

    assert_allclose(
        jnp.moveaxis(st.s, -1, 0), d.joint_positions, rtol=1e-2, atol=5e-3
    )
    assert_allclose(
        jnp.moveaxis(st.p, -1, 0), d.base_position, rtol=1e-2, atol=2e-3
    )


@pytest.fixture(scope="module")
def garpez_setup():
    """Small-model twin of ``setup`` for trajectory-level checks whose
    coverage is morphology-independent (compiling the generic humanoid
    step dominates the cold suite on a single-core box)."""
    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    n = model.number_of_joints()
    key = jax.random.PRNGKey(7)
    B = 2
    datas = jax.vmap(
        lambda k: js.JaxSimModelData.build(
            model,
            base_position=jnp.array([0.0, 0.0, 0.33])
            + 0.005 * jax.random.normal(k, (3,)),
            joint_positions=0.1 * jax.random.normal(k, (n,)),
            velocity_representation=js.VelRepr.Inertial,
        )
    )(jax.random.split(key, B))
    return model, eng, datas


def test_trajectory_equivalence_garpez(garpez_setup):
    """Default-tier twin of test_trajectory_equivalence on the 3-DoF
    garpez model: 20 full steps of engine vs generic js.model.step.
    (eng.rollout's lax.scan wrapper is separately exercised by the plane
    -terrain and domain-randomization tests.)"""
    model, eng, datas = garpez_setup
    tau_fn = lambda s, sd: -20.0 * s - 0.2 * sd
    step_ref = jax.jit(
        jax.vmap(
            lambda d: js.model.step(
                _generic(model),
                d,
                joint_force_references=tau_fn(d.joint_positions, d.joint_velocities),
            )
        )
    )
    step_b = jax.jit(lambda st: eng.step(st, tau_fn(st.s, st.sd)))

    d = datas
    st = eng.state_from_data(datas)
    for _ in range(20):
        d = step_ref(d)
        st = step_b(st)

    assert_allclose(
        jnp.moveaxis(st.s, -1, 0), d.joint_positions, rtol=1e-2, atol=5e-3
    )
    assert_allclose(
        jnp.moveaxis(st.p, -1, 0), d.base_position, rtol=1e-2, atol=2e-3
    )


@pytest.mark.slow
def test_rollout_grad(setup):
    """jax.grad flows through a small model's engine rollout (the reverse
    scan graph of the unrolled step takes minutes to compile on one core;
    step-level AD stays in the default tier)."""
    small = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng_s = BatchedEngine.build(small)
    st_s = eng_s.init_state(4)

    def loss(kp):
        o = eng_s.rollout(st_s, 5, policy=lambda s: -kp * s.s - 0.5 * s.sd)
        return jnp.sum(o.sd**2)

    g = jax.jit(jax.grad(loss))(60.0)
    assert np.isfinite(float(g))


def test_state_data_roundtrip(setup):
    model, eng, datas = setup
    st = eng.state_from_data(datas)
    datas2 = eng.data_from_state(model, st)
    assert_allclose(datas2.base_position, datas.base_position, atol=1e-6)
    assert_allclose(datas2.joint_positions, datas.joint_positions, atol=1e-6)
    assert_allclose(
        datas2._link_transforms, datas._link_transforms, atol=1e-5
    )


def test_engine_rejects_unsupported_configs():
    from jaxsim_tpu.ops.contacts import RigidContacts, RigidContactsParams
    from jaxsim_tpu.terrain import HeightmapTerrain

    # Heightmap terrain IS supported by the XLA engine since round 3 —
    # but the fused Pallas kernels reject it (per-lane gathers don't
    # lower to Mosaic).
    m1 = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(),
        terrain=HeightmapTerrain.build(
            heights=np.zeros((4, 4)), extent=(-2, 2, -2, 2)
        ),
    )
    eng1 = BatchedEngine.build(m1)
    assert eng1.terrain_kind == "heightmap"
    from jaxsim_tpu.ops import pallas_step as ps

    with pytest.raises(ValueError, match="heightmap"):
        ps.engine_param_order(eng1)

    # Rigid (QP) contacts ARE supported since the APGD lowering.
    m2 = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(),
        contact_model=RigidContacts(),
        contact_params=RigidContactsParams.build(),
    )
    assert BatchedEngine.build(m2).contact_model == "rigid"

    # Weld constraints ARE supported since the Delassus lowering — but the
    # endpoints must be frame indices, not link indices.
    from jaxsim_tpu.api.kin_dyn_parameters import ConstraintMap

    m3 = js.JaxSimModel.build_from_model_description(
        models.build_garpez_urdf(),
        constraints=ConstraintMap().add_constraint(0, 1),
    )
    with pytest.raises(ValueError, match="[Ff]rame"):
        BatchedEngine.build(m3)


def _sphere_model(n_points=8, **kwargs):
    """Sphere model with a REDUCED fibonacci point count (default-tier
    compile cost scales with contact points; 8 points cover the
    engine-vs-generic contact math as well as the default 50)."""
    import os

    old = os.environ.get("JAXSIM_COLLISION_SPHERE_POINTS")
    os.environ["JAXSIM_COLLISION_SPHERE_POINTS"] = str(n_points)
    try:
        return js.JaxSimModel.build_from_model_description(
            models.build_sphere_urdf(), **kwargs
        )
    finally:
        if old is None:
            os.environ.pop("JAXSIM_COLLISION_SPHERE_POINTS", None)
        else:
            os.environ["JAXSIM_COLLISION_SPHERE_POINTS"] = old


def test_engine_plane_terrain_equivalence():
    """A sphere dropped on a 10-degree incline: the engine's static-normal
    contact path matches the generic js.model.step path."""
    from jaxsim_tpu.terrain import PlaneTerrain

    normal = (np.sin(np.deg2rad(10.0)), 0.0, np.cos(np.deg2rad(10.0)))
    # 16 points: enough cap smoothness to actually ROLL downhill (8-point
    # clouds tumble chaotically), still 3x cheaper to compile than 50.
    model = _sphere_model(n_points=16, terrain=PlaneTerrain.build(normal=normal))
    eng = BatchedEngine.build(model)
    assert eng.terrain_normal[0] > 0  # the incline actually reached the engine

    st = eng.init_state(2, base_position=(0.0, 0.0, 0.16))
    out = jax.jit(
        lambda s: eng.rollout(s, 100, policy=lambda st: jnp.zeros_like(st.s))
    )(st)

    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.16]),
        velocity_representation=js.VelRepr.Inertial,
    )

    @jax.jit
    def run(d):
        def body(d, _):
            return js.model.step(_generic(model), d), None

        o, _ = jax.lax.scan(body, d, None, length=100)
        return o

    ref = run(data)
    # The sphere must both settle onto the plane and slide down it.
    assert_allclose(out.p[:, 0], ref.base_position, rtol=1e-3, atol=1e-4)
    assert_allclose(out.v[:, 0], ref.base_velocity, rtol=1e-3, atol=1e-4)
    assert np.asarray(ref.base_position)[0] > 1e-3  # slid along +x (downhill)


def test_engine_fixed_base():
    """The engine handles fixed-base models (pendulum swing matches the
    generic path)."""
    model = js.JaxSimModel.build_from_model_description(models.build_pendulum_urdf(2))
    eng = BatchedEngine.build(model)
    st = eng.init_state(2, base_position=(0.0, 0.0, 0.0))
    st = st.replace(s=jnp.full((2, 2), 0.5))

    out = jax.jit(lambda s: eng.rollout(s, 100, policy=lambda st: jnp.zeros_like(st.s)))(st)

    data = js.JaxSimModelData.build(model, joint_positions=jnp.array([0.5, 0.5]))

    @jax.jit
    def run(d):
        def body(d, _):
            return js.model.step(_generic(model), d), None

        o, _ = jax.lax.scan(body, d, None, length=100)
        return o

    ref = run(data)
    assert_allclose(out.s[:, 0], ref.joint_positions, rtol=1e-3, atol=1e-3)


def test_pallas_interpret_micro_model():
    """The fused kernel matches the engine in interpreter mode on the
    SMALLEST engine config (fixed-base pendulum, no contacts): interpret
    cost scales with the kernel's op count, and this keeps one honest
    kernel-vs-engine check in the default tier (~1/5 the cost of the
    tiny floating-contact model, which runs in the slow tier below)."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_pendulum_urdf(1))
    eng = BatchedEngine.build(model)
    st = eng.init_state(1024, key=jax.random.PRNGKey(3))
    st = st.replace(s=0.4 * jnp.ones_like(st.s))
    policy = lambda s: -2.0 * s.s - 0.1 * s.sd
    ref = eng.step(st, policy(st))
    with pltpu.force_tpu_interpret_mode():
        out = ps.untile_state(ps.build_pallas_step(eng, policy)(ps.tile_state(st)))
    for f in ["s", "sd"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )


@pytest.mark.slow
def test_pallas_interpret_small_model():
    """The fused kernel matches the engine in interpreter mode (floating
    base + soft contact; the micro fixed-base twin runs in the default
    tier)."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = _tiny_floating_model()
    eng = BatchedEngine.build(model)
    st = eng.init_state(1024, key=jax.random.PRNGKey(0))
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    ref = eng.step(st, policy(st))
    with pltpu.force_tpu_interpret_mode():
        out = ps.untile_state(ps.build_pallas_step(eng, policy)(ps.tile_state(st)))
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )


@pytest.mark.stress
def test_pallas_rollout_kernel_interpret_small_model():
    """The in-kernel fori_loop rollout (one launch per horizon — the default
    bench path) matches the per-step engine rollout in interpreter mode.
    (slow: ~3x the single-step interpret test above, which stays in the
    default tier; the rollout loop itself is TPU-covered by the fused
    policy-gradient tests and the driver's multichip dryrun.)"""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = _tiny_floating_model()
    eng = BatchedEngine.build(model)
    st = eng.init_state(1024, key=jax.random.PRNGKey(1))
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    ref = eng.rollout(st, 3, policy=policy)
    with pltpu.force_tpu_interpret_mode():
        out = ps.untile_state(ps.build_pallas_rollout(eng, 3, policy)(ps.tile_state(st)))
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )


def test_domain_randomization_engine():
    """Per-env contact-parameter multipliers match separately-built models
    with scaled parameters."""
    model = _sphere_model()
    eng = BatchedEngine.build(model)

    st = eng.init_state(2, base_position=(0.0, 0.0, 0.12))
    domain = {
        "Kmul": jnp.array([0.5, 2.0]),
        "Dmul": jnp.array([1.0, 0.7]),
        "mumul": jnp.array([1.0, 0.3]),
    }
    out = jax.jit(lambda s: eng.rollout(s, 30, domain=domain))(st)

    # Reference: one engine per parameter set, scalar params.
    for i, (km, dm, mm) in enumerate([(0.5, 1.0, 1.0), (2.0, 0.7, 0.3)]):
        m_i = model.replace(
            contact_params=model.contact_params.replace(
                K=model.contact_params.K * km,
                D=model.contact_params.D * dm,
                mu=model.contact_params.mu * mm,
            )
        )
        eng_i = BatchedEngine.build(m_i)
        ref = jax.jit(
            lambda s, e=eng_i: e.rollout(s, 30)
        )(eng_i.init_state(1, base_position=(0.0, 0.0, 0.12)))
        assert_allclose(out.p[:, i], ref.p[:, 0], rtol=1e-4, atol=1e-5)
        assert_allclose(out.v[:, i], ref.v[:, 0], rtol=1e-4, atol=1e-4)

    # The two envs actually diverged (different stiffness -> different settle).
    assert not np.allclose(np.asarray(out.p[2, 0]), np.asarray(out.p[2, 1]))


@pytest.mark.stress
def test_domain_randomization_pallas_interpret():
    """The fused rollout with per-env multiplier tiles matches the engine."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    B = 1024
    st = eng.init_state(B, base_position=(0.0, 0.0, 0.35))
    key = jax.random.PRNGKey(5)
    Kmul = jnp.exp(0.3 * jax.random.normal(key, (B,)))

    ref = eng.rollout(st, 3, domain={"Kmul": Kmul})

    run = ps.build_pallas_rollout(eng, 3, domain=True)
    tile = lambda a: a.reshape(a.shape[:-1] + (-1, 128))
    with pltpu.force_tpu_interpret_mode():
        out = ps.untile_state(run(ps.tile_state(st), Kmul=tile(Kmul)))
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )

    with pytest.raises(ValueError, match="tile shape"):
        run(ps.tile_state(st), Kmul=Kmul)  # untiled (B,) shape rejected


@pytest.mark.stress
def test_diff_pallas_step_gradients_match_engine():
    """build_diff_pallas_step: forward (interpret-mode Pallas) matches the
    engine step, and jax.grad through it w.r.t. state and torques matches
    jax.grad through the plain engine step."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(2)))
    tau = 0.3 * jax.random.normal(
        jax.random.PRNGKey(3), (eng.n_joints,) + st.p.shape[1:]
    )
    step = ps.build_diff_pallas_step(eng)

    def loss_pallas(st_, tau_):
        new = step(st_, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    def loss_engine(st_, tau_):
        new = eng.step(st_, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    with pltpu.force_tpu_interpret_mode():
        out = step(st, tau)
        g_st, g_tau = jax.grad(loss_pallas, argnums=(0, 1))(st, tau)
    ref = eng.step(st, tau)
    rg_st, rg_tau = jax.grad(loss_engine, argnums=(0, 1))(st, tau)

    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )
        assert_allclose(
            getattr(g_st, f), getattr(rg_st, f), rtol=1e-4, atol=1e-5,
            err_msg=f"grad {f}",
        )
    assert_allclose(g_tau, rg_tau, rtol=1e-4, atol=1e-5, err_msg="grad tau")
    assert float(jnp.abs(g_tau).max()) > 0.0


@pytest.mark.stress
@pytest.mark.parametrize("contact", ["relaxed_rigid", "rigid"])
def test_diff_pallas_step_contact_rich_gradients(contact, prng_key):
    """Contact-rich tier-2 differentiability: build_diff_pallas_step with
    relaxed-rigid / rigid engines — interpret-mode Pallas forward, XLA
    engine backward (whose iterative solves differentiate implicitly via
    custom_linear_solve) — produces finite gradients matching the plain
    engine's."""
    import dataclasses as dc

    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    urdf = models.build_garpez_urdf()
    if contact == "relaxed_rigid":
        eng = dc.replace(
            BatchedEngine.build(_rr_model(urdf)), rr_iterations=6
        )
    else:
        eng = dc.replace(
            BatchedEngine.build(_rigid_model(urdf)), rigid_iterations=6
        )
    st = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.015)))
    st = dc.replace(
        st,
        q=jnp.broadcast_to(
            jnp.array([0.995, 0.0998, 0.0, 0.0])[:, None, None], st.q.shape
        ),
    )
    tau = 0.1 * jax.random.normal(prng_key, (eng.n_joints,) + st.p.shape[1:])
    step = ps.build_diff_pallas_step(eng)

    def loss_pallas(tau_):
        new = step(st, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    def loss_engine(tau_):
        new = eng.step(st, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    with pltpu.force_tpu_interpret_mode():
        g_tau = jax.grad(loss_pallas)(tau)
    rg_tau = jax.grad(loss_engine)(tau)
    assert bool(jnp.all(jnp.isfinite(g_tau)))
    assert_allclose(g_tau, rg_tau, rtol=1e-4, atol=1e-6, err_msg="grad tau")
    assert float(jnp.abs(g_tau).max()) > 0.0


@pytest.mark.tpu
def test_fused_diff_pallas_step_relaxed_rigid_tpu():
    """Fused BACKWARD kernel with relaxed-rigid contacts: the PCG's
    hand-written implicit VJP (custom_vjp: one more in-kernel PCG on the
    transposed SPD system + an elementwise operator vjp) lets jax.vjp of
    the engine step trace INSIDE the Pallas kernel. Gradients match the
    XLA engine's. TPU-only for the same compile-time reason as the soft
    fused-backward test."""
    import dataclasses as dc

    from jaxsim_tpu.ops import pallas_step as ps
    from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (interpret-mode compile is pathological)")

    model = js.JaxSimModel.build_from_model_description(
        models.build_garpez_urdf(), contact_model=RelaxedRigidContacts()
    )
    eng = dc.replace(BatchedEngine.build(model), rr_iterations=8)
    st = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.015)))
    st = dc.replace(
        st,
        q=jnp.broadcast_to(
            jnp.array([0.995, 0.0998, 0.0, 0.0])[:, None, None], st.q.shape
        ),
    )
    tau = 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), (eng.n_joints,) + st.p.shape[1:]
    )
    fused = ps.build_fused_diff_pallas_step(eng)

    def loss_fused(tau_):
        new = fused(st, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    def loss_engine(tau_):
        new = eng.step(st, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    g = jax.jit(jax.grad(loss_fused))(tau)
    rg = jax.grad(loss_engine)(tau)
    assert bool(jnp.all(jnp.isfinite(g)))
    # On real silicon the Mosaic and XLA compilations of the same f32 math
    # order instructions differently; the implicit-PCG gradients agree to
    # ~1% relative (measured r05: max rel 9.3e-3, max abs 4.9e-6), vs
    # bit-level in interpret mode.
    assert_allclose(g, rg, rtol=3e-2, atol=2e-5, err_msg="grad tau")


@pytest.mark.tpu
def test_fused_diff_pallas_step_rigid_tpu():
    """Fused BACKWARD kernel with rigid (QP) contacts: the APGD cone solve
    carries an implicit VJP (Neumann series on the transposed
    projected-gradient fixed point) and the impact projection's CG an
    implicit SPD-transpose VJP, so jax.vjp of the engine step traces
    INSIDE the Pallas kernel. Gradients match the XLA engine's. TPU-only
    for the same compile-time reason as the soft fused-backward test."""
    import dataclasses as dc

    from jaxsim_tpu.ops import pallas_step as ps
    from jaxsim_tpu.ops.contacts.rigid import RigidContacts

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (interpret-mode compile is pathological)")

    model = js.JaxSimModel.build_from_model_description(
        models.build_garpez_urdf(), contact_model=RigidContacts()
    )
    eng = dc.replace(BatchedEngine.build(model), rigid_iterations=8)
    st = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.015)))
    st = dc.replace(
        st,
        q=jnp.broadcast_to(
            jnp.array([0.995, 0.0998, 0.0, 0.0])[:, None, None], st.q.shape
        ),
    )
    tau = 0.1 * jax.random.normal(
        jax.random.PRNGKey(7), (eng.n_joints,) + st.p.shape[1:]
    )
    fused = ps.build_fused_diff_pallas_step(eng)

    def loss_fused(tau_):
        new = fused(st, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    def loss_engine(tau_):
        new = eng.step(st, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    g = jax.jit(jax.grad(loss_fused))(tau)
    rg = jax.grad(loss_engine)(tau)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert_allclose(g, rg, rtol=1e-3, atol=1e-5, err_msg="grad tau")


@pytest.mark.tpu
def test_fused_diff_pallas_step_backward_kernel_tpu():
    """build_fused_diff_pallas_step: BOTH forward and backward are Pallas
    kernels (vjp traced inside the kernel body); gradients w.r.t. state and
    torques match jax.grad through the plain engine step.

    TPU-only: XLA:CPU takes tens of minutes to compile the interpret-mode
    backward kernel even for garpez (the vjp graph is ~3x the forward);
    Mosaic compiles it in ~40 s. Grad tolerances follow policy tier B
    widened for MXU-vs-XLA f32 accumulation-order differences."""
    from jaxsim_tpu.ops import pallas_step as ps

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (interpret-mode compile is pathological)")

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(12)))
    tau = 0.3 * jax.random.normal(
        jax.random.PRNGKey(13), (eng.n_joints,) + st.p.shape[1:]
    )
    step = ps.build_fused_diff_pallas_step(eng)

    def loss_pallas(st_, tau_):
        new = step(st_, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    def loss_engine(st_, tau_):
        new = eng.step(st_, tau_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    g_st, g_tau = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(st, tau)
    rg_st, rg_tau = jax.jit(jax.grad(loss_engine, argnums=(0, 1)))(st, tau)

    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(g_st, f), getattr(rg_st, f), rtol=1e-3, atol=1e-5,
            err_msg=f"grad {f}",
        )
    assert_allclose(g_tau, rg_tau, rtol=1e-3, atol=1e-5, err_msg="grad tau")
    assert float(jnp.abs(g_tau).max()) > 0.0


@pytest.mark.tpu
def test_fused_diff_pallas_rollout_policy_gradient_tpu():
    """build_fused_diff_pallas_rollout: policy-parameter gradients through a
    multi-step rollout where forward AND backward run as Pallas kernels
    match the all-XLA engine rollout (TPU-only, see step test above)."""
    from jaxsim_tpu.ops import pallas_step as ps

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (interpret-mode compile is pathological)")

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(14)))
    import dataclasses

    st = dataclasses.replace(
        st,
        s=0.2 * jax.random.normal(jax.random.PRNGKey(15), st.s.shape),
        sd=0.1 * jax.random.normal(jax.random.PRNGKey(16), st.sd.shape),
    )
    gains0 = jnp.array([5.0, 0.1])

    def policy(st_, gains):
        return -gains[0] * st_.s - gains[1] * st_.sd

    def loss_engine(gains):
        def body(s, _):
            return eng.step(s, policy(s, gains)), None

        out, _ = jax.lax.scan(body, st, None, length=3)
        return jnp.mean(out.sd**2)

    ref_loss, ref_grad = jax.value_and_grad(loss_engine)(gains0)

    rollout = ps.build_fused_diff_pallas_rollout(eng, 3)

    def loss_pallas(gains):
        return jnp.mean(rollout(st, policy, gains).sd**2)

    val, grad = jax.jit(jax.value_and_grad(loss_pallas))(gains0)
    assert_allclose(val, ref_loss, rtol=1e-3, atol=1e-6)
    assert_allclose(grad, ref_grad, rtol=1e-3, atol=1e-6)
    assert float(jnp.abs(grad).max()) > 0.0


@pytest.mark.tpu
def test_fused_diff_pallas_step_params_grad_tpu():
    """params_grad=True: the fused backward kernel also emits model-
    parameter cotangents (link inertias M, contact points, joint
    placements), batch-reduced inside the kernel across grid tiles; they
    match jax.grad through the plain engine step (co-design gradients at
    kernel speed). TPU-only like the other fused-backward tests."""
    from jaxsim_tpu.ops import pallas_step as ps

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (interpret-mode compile is pathological)")

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(22)))
    tau = 0.3 * jax.random.normal(
        jax.random.PRNGKey(23), (eng.n_joints,) + st.p.shape[1:]
    )
    pr = eng.params()
    step = ps.build_fused_diff_pallas_step(eng, params_grad=True)

    def loss_pallas(pr_):
        new = step(st, tau, pr_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    def loss_engine(pr_):
        new = eng.step(st, tau, {**eng.params(), **pr_})
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    g = jax.jit(jax.grad(loss_pallas))(pr)
    rg = jax.jit(jax.grad(loss_engine))(pr)
    nonzero = 0
    for k in g:
        # Param cotangents are sums over B=1024 envs: the kernel accumulates
        # sequentially across grid tiles while XLA uses a reduction tree, so
        # f32 ordering noise (with cancellation) reaches a few 1e-3 relative
        # — wider than tier D, bounded like tier C.
        assert_allclose(
            g[k], rg[k], rtol=5e-3, atol=5e-4 * max(1.0, float(jnp.abs(rg[k]).max())),
            err_msg=f"param cotangent {k}",
        )
        nonzero += int(float(jnp.abs(jnp.asarray(g[k])).max()) > 0)
    assert nonzero >= 3  # inertias, contact points, joint placements all live


@pytest.mark.stress
def test_diff_pallas_rollout_policy_gradient():
    """build_diff_pallas_rollout: gradients flow to XLA-side policy
    parameters through the fused Pallas steps (with and without
    checkpointing), matching the all-XLA engine rollout."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(4)))
    import dataclasses

    st = dataclasses.replace(
        st,
        s=0.2 * jax.random.normal(jax.random.PRNGKey(5), st.s.shape),
        sd=0.1 * jax.random.normal(jax.random.PRNGKey(6), st.sd.shape),
    )
    gains0 = jnp.array([5.0, 0.1])

    def policy(st_, gains):
        return -gains[0] * st_.s - gains[1] * st_.sd

    def loss_engine(gains):
        def body(s, _):
            return eng.step(s, policy(s, gains)), None

        out, _ = jax.lax.scan(body, st, None, length=4)
        return jnp.mean(out.sd**2)

    ref_loss, ref_grad = jax.value_and_grad(loss_engine)(gains0)

    for chunk in (None, 2):
        rollout = ps.build_diff_pallas_rollout(eng, 4, checkpoint_chunk=chunk)

        def loss_pallas(gains):
            return jnp.mean(rollout(st, policy, gains).sd**2)

        with pltpu.force_tpu_interpret_mode():
            val, grad = jax.value_and_grad(loss_pallas)(gains0)
        assert_allclose(val, ref_loss, rtol=1e-5, atol=1e-6, err_msg=f"chunk={chunk}")
        assert_allclose(grad, ref_grad, rtol=1e-4, atol=1e-6, err_msg=f"chunk={chunk}")
        assert float(jnp.abs(grad).max()) > 0.0


def test_rotated_base_quaternion_equivalence():
    """Regression: the engine's quaternion derivative must use the INERTIAL
    convention q̇ = ½[0,ω]⊗q like the generic path — a strongly rotated base
    with large angular velocity exposes a flipped cross term that identity
    orientations hide. Default tier deliberately (ADVICE r03): the other
    default-tier trajectory tests use near-identity orientations that hide
    exactly this bug, and the tiny-model generic compile is small."""
    # Model-independent convention check: the tiny floating model keeps the
    # generic-path compile (the dominant cost) small.
    model = _tiny_floating_model()
    eng = BatchedEngine.build(model)
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 5.0]),  # airborne: no contacts
        base_quaternion=jnp.array([0.5, 0.5, 0.5, 0.5]),
        base_angular_velocity=jnp.array([2.0, -1.0, 0.5]),
        velocity_representation=js.VelRepr.Inertial,
    )
    st = eng.state_from_data(jax.tree.map(lambda x: x[None], data))
    step_ref = jax.jit(lambda d: js.model.step(_generic(model), d))
    step_eng = jax.jit(lambda s: eng.step(s, jnp.zeros((eng.n_joints, 1))))
    for _ in range(20):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(st.q[:, 0], data.base_quaternion, atol=1e-5)
    assert_allclose(st.p[:, 0], data.base_position, atol=1e-5)


@pytest.mark.stress
@pytest.mark.parametrize("integrator_name", ["rk4", "rk4fast"])
def test_engine_rk4_equivalence(integrator_name):
    """Engine RK4 / RK4-fast trajectories match the generic js.model.step
    path with the corresponding integrator (tiny 2-link model in contact).
    slow tier: even at tiny scale the generic 4-stage reference is one of
    the suite's biggest compiles; default-tier RK4 coverage is the generic
    integrators-agree pendulum test, and the engine RK4 path is also held
    by the sharded config-5 test and the bench config-5 extra."""
    from jaxsim_tpu.api.model import IntegratorType

    itype = {
        "rk4": IntegratorType.RungeKutta4,
        "rk4fast": IntegratorType.RungeKutta4Fast,
    }[integrator_name]
    model = _tiny_floating_model(integrator=itype)
    eng = BatchedEngine.build(model)
    assert eng.integrator == integrator_name

    n = model.number_of_joints()
    data = js.JaxSimModelData.build(
        model,
        # Base slightly penetrating: the m-state comparison below needs an
        # active contact from step 0.
        base_position=jnp.array([0.0, 0.0, 0.095]),
        base_quaternion=jnp.array([0.995, 0.0998, 0.0, 0.0]),
        joint_positions=0.1 * jax.random.normal(jax.random.PRNGKey(0), (n,)),
        velocity_representation=js.VelRepr.Inertial,
    )
    st = eng.state_from_data(jax.tree.map(lambda x: x[None], data))
    tau_fn = lambda s, sd: -60.0 * s - 0.5 * sd
    step_ref = jax.jit(
        lambda d: js.model.step(
            _generic(model),
            d,
            joint_force_references=tau_fn(d.joint_positions, d.joint_velocities),
        )
    )
    step_eng = jax.jit(lambda s: eng.step(s, tau_fn(s.s, s.sd)))
    for _ in range(25):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(st.s[:, 0], data.joint_positions, rtol=1e-3, atol=1e-4)
    assert_allclose(st.p[:, 0], data.base_position, rtol=1e-3, atol=1e-4)
    assert_allclose(st.q[:, 0], data.base_quaternion, atol=1e-4)
    assert_allclose(st.m[..., 0], data.contact_state["tangential_deformation"], rtol=1e-3, atol=1e-5)


# ----------------------------------------------------------------------
# Relaxed-rigid contacts on the hot path (VERDICT r1 item #1)
# ----------------------------------------------------------------------


def _rr_model(urdf, itype=None):
    from jaxsim_tpu.api.model import IntegratorType
    from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts

    return js.JaxSimModel.build_from_model_description(
        urdf,
        contact_model=RelaxedRigidContacts(),
        integrator=itype or IntegratorType.SemiImplicitEuler,
    )


def _rr_engine(model, exact=True):
    import dataclasses as dc

    eng = BatchedEngine.build(model)
    assert eng.contact_model == "relaxed_rigid"
    if exact:
        eng = dc.replace(eng, rr_iterations=3 * eng.n_points + 6)
    return eng


def test_engine_relaxed_rigid_box_equivalence(prng_key):
    """Floating box settling on relaxed-rigid contacts: the engine's
    matrix-free PCG solve matches the generic exact-Cholesky path
    (tolerance tier C — both solvers carry f32 error ~cond(A)·eps; the
    formulation agrees to 5e-15 in float64)."""
    model = _rr_model(models.build_box_urdf())
    eng = _rr_engine(model)

    B = 4
    keys = jax.random.split(prng_key, B)

    def build_one(k):
        kk = jax.random.split(k, 3)
        return js.JaxSimModelData.build(
            model,
            base_position=jnp.array([0.0, 0.0, 0.08])
            + 0.02 * jax.random.normal(kk[0], (3,)),
            base_linear_velocity=0.1 * jax.random.normal(kk[1], (3,)),
            base_angular_velocity=0.1 * jax.random.normal(kk[2], (3,)),
        )

    data = jax.vmap(build_one)(keys)
    step_ref = jax.jit(jax.vmap(lambda d: js.model.step(_generic(model), d)))
    step_eng = jax.jit(lambda s: eng.step(s))
    st = eng.state_from_data(data)
    for _ in range(5):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(data.base_position, jnp.moveaxis(st.p, -1, 0), rtol=1e-3, atol=1e-5)
    assert_allclose(data.base_quaternion, jnp.moveaxis(st.q, -1, 0), rtol=1e-3, atol=1e-5)
    assert_allclose(
        data.base_linear_velocity_inertial,
        jnp.moveaxis(st.v[0:3], -1, 0),
        rtol=2e-3,
        atol=2e-4,
    )


@pytest.mark.stress
@pytest.mark.parametrize("integrator_name", ["sie", "rk4"])
def test_engine_relaxed_rigid_garpez_equivalence(integrator_name, prng_key):
    """Articulated floating-base model on relaxed-rigid contacts (SIE and
    RK4): engine trajectories match the generic path (tier C/T)."""
    from jaxsim_tpu.api.model import IntegratorType

    itype = {
        "sie": IntegratorType.SemiImplicitEuler,
        "rk4": IntegratorType.RungeKutta4,
    }[integrator_name]
    model = _rr_model(models.build_garpez_urdf(), itype)
    eng = _rr_engine(model)
    n = model.number_of_joints()

    # Tilted low base: two bottom corners in definite penetration, so the
    # PCG contact solve is actually exercised (a pose at the model's
    # standing height leaves every collidable point airborne).
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.015]),
        base_quaternion=jnp.array([0.995, 0.0998, 0.0, 0.0]),
        joint_positions=0.05 * jax.random.normal(prng_key, (n,)),
    )
    data = jax.tree.map(lambda x: x[None], data)
    tau_fn = lambda s, sd: -20.0 * s - 0.1 * sd
    step_ref = jax.jit(
        jax.vmap(
            lambda d: js.model.step(
                _generic(model),
                d,
                joint_force_references=tau_fn(
                    d.joint_positions, d.joint_velocities
                ),
            )
        )
    )
    step_eng = jax.jit(lambda s: eng.step(s, tau_fn(s.s, s.sd)))
    st = eng.state_from_data(data)
    for _ in range(3):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(data.base_position, jnp.moveaxis(st.p, -1, 0), rtol=1e-3, atol=1e-4)
    assert_allclose(data.joint_positions, jnp.moveaxis(st.s, -1, 0), rtol=1e-3, atol=1e-4)
    assert_allclose(
        data.joint_velocities, jnp.moveaxis(st.sd, -1, 0), rtol=1e-2, atol=1e-2
    )


def test_engine_relaxed_rigid_settles():
    """A box dropped on relaxed-rigid contacts comes to rest ON the plane
    (no penetration drift, no bounce-off) within 300 steps."""
    model = _rr_model(models.build_box_urdf())
    eng = _rr_engine(model, exact=False)  # default (auto) iteration count
    st = eng.init_state(2, base_position=(0.0, 0.0, 0.12))
    out = jax.jit(
        lambda s: eng.rollout(s, 300, policy=lambda st_: jnp.zeros_like(st_.s))
    )(st)
    # Box half-height 0.05: resting pose ~0.05 minus small regularized slack.
    assert np.all(np.asarray(out.p[2]) > 0.040)
    assert np.all(np.asarray(out.p[2]) < 0.055)
    assert np.all(np.abs(np.asarray(out.v)) < 0.05)


@pytest.mark.stress
def test_pallas_relaxed_rigid_interpret():
    """The fused Pallas step kernel runs the relaxed-rigid PCG solve
    in-kernel (interpret mode) and matches the XLA engine step. (garpez —
    interpret mode cannot pad the box model's 0-joint block shapes; few
    PCG iterations since both paths use the same count.)"""
    import dataclasses as dc

    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = _rr_model(models.build_garpez_urdf())
    eng = dc.replace(_rr_engine(model, exact=False), rr_iterations=6)
    st = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.33)))
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    ref = eng.step(st, policy(st))
    with pltpu.force_tpu_interpret_mode():
        out = ps.build_pallas_step(eng, policy)(st)
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )


@pytest.mark.stress
def test_pallas_step_rk4_interpret():
    """The fused Pallas step kernel dispatches to the engine's RK4 path
    in-kernel (interpret mode) and matches the XLA engine step."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.api.model import IntegratorType
    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(
        models.build_garpez_urdf(), integrator=IntegratorType.RungeKutta4
    )
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(7)))
    step = ps.build_pallas_step(eng)
    with pltpu.force_tpu_interpret_mode():
        out = step(st)
    ref = eng.step(st, -60.0 * st.s - 0.5 * st.sd)
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )


@pytest.mark.slow
def test_dynamics_domain_randomization():
    """Per-env gmul/Mmul multipliers: gmul scales gravity (free-fall
    velocity), and Mmul=c is exactly equivalent to scaling every link
    spatial inertia by c."""
    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    B = 8
    st = eng.init_state(B, key=jax.random.PRNGKey(0))
    import dataclasses as dc

    st = dc.replace(st, p=st.p.at[2].set(5.0))  # airborne: no contacts
    tile = st.p.shape[1:]
    tau = 0.4 * jax.random.normal(jax.random.PRNGKey(1), (eng.n_joints,) + tile)
    pr = eng.params()

    # gmul: scaled gravity reproduces a half-gravity free fall.
    out_full = eng.step(st, jnp.zeros_like(tau), pr)
    out_half = eng.step(st, jnp.zeros_like(tau), {**pr, "gmul": 0.5 * jnp.ones(tile)})
    out_zero = eng.step(st, jnp.zeros_like(tau), {**pr, "gmul": jnp.zeros(tile)})
    dv_full = out_full.v[2] - st.v[2]
    dv_half = out_half.v[2] - st.v[2]
    assert float(jnp.abs(dv_full).min()) > 0.0
    assert_allclose(dv_half, 0.5 * dv_full, rtol=1e-4, atol=1e-6)
    assert_allclose(out_zero.v[2], st.v[2], atol=1e-6)

    # Mmul: equivalent to scaling pr["M"] itself.
    c = 1.7
    out_mul = eng.step(st, tau, {**pr, "Mmul": c * jnp.ones(tile)})
    out_ref = eng.step(st, tau, {**pr, "M": pr["M"] * c})
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out_mul, f), getattr(out_ref, f), rtol=1e-5, atol=1e-6,
            err_msg=f,
        )
    # Heavier robot responds less to the same torques.
    out_base = eng.step(st, tau, pr)
    assert float(jnp.abs(out_mul.sd - out_base.sd).max()) > 1e-6


@pytest.mark.stress
def test_dynamics_domain_randomization_pallas_interpret():
    """gmul/Mmul thread through the fused rollout kernel (interpret mode)
    and match the XLA engine with the same multipliers."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(2)))
    import dataclasses as dc

    st = dc.replace(
        st,
        s=0.2 * jax.random.normal(jax.random.PRNGKey(8), st.s.shape),
        sd=0.1 * jax.random.normal(jax.random.PRNGKey(9), st.sd.shape),
    )
    tile = st.p.shape[1:]
    key = jax.random.PRNGKey(3)
    gmul = 1.0 + 0.2 * jax.random.normal(key, tile)
    Mmul = 1.0 + 0.1 * jax.random.normal(jax.random.split(key)[0], tile)

    run = ps.build_pallas_rollout(eng, 3, domain=True)
    with pltpu.force_tpu_interpret_mode():
        out = run(st, gmul=gmul, Mmul=Mmul)
    ref = eng.rollout(st, 3, domain={"gmul": gmul, "Mmul": Mmul})
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )
    # The multipliers actually change the trajectory.
    base = eng.rollout(st, 3)
    assert float(jnp.abs(ref.sd - base.sd).max()) > 1e-6


@pytest.mark.stress
def test_mlp_policy_env_rollout_interpret():
    """build_pallas_env_rollout(mlp_policy=H): in-kernel tanh-MLP torques
    match an XLA reference rollout with the same weights (interpret mode),
    including the per-tile population variant."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    B = 2048
    st = ps.tile_state(eng.init_state(B, key=jax.random.PRNGKey(0)))
    import dataclasses as dc

    st = dc.replace(
        st, s=0.2 * jax.random.normal(jax.random.PRNGKey(1), st.s.shape)
    )
    n, H, d = eng.n_joints, 4, ps.obs_dim(eng.n_joints)
    key = jax.random.PRNGKey(2)
    W1 = 0.3 * jax.random.normal(key, (H, d))
    b1 = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (H, 1))
    W2 = 0.5 * jax.random.normal(jax.random.fold_in(key, 2), (n, H))
    b2 = 0.1 * jax.random.normal(jax.random.fold_in(key, 3), (n, 1))

    def obs_rows(s):
        rows = [s.s[i] for i in range(n)] + [s.sd[i] for i in range(n)]
        rows += [s.q[i] for i in range(4)] + [s.v[i] for i in range(6)]
        rows.append(s.p[2])
        return jnp.stack(rows)

    def xla_policy(s):
        o = obs_rows(s)
        h = jnp.tanh(jnp.einsum("hd,d...->h...", W1, o) + b1[:, :, None])
        return jnp.einsum("nh,h...->n...", W2, h) + b2[:, :, None]

    n_steps = 3
    run = ps.build_pallas_env_rollout(
        eng, n_steps, mlp_policy=H, episode_length=10**6,
        healthy_z_range=(-1e6, 1e6),
    )
    with pltpu.force_tpu_interpret_mode():
        out, rew, resets, steps = run(st, W1=W1, b1=b1, W2=W2, b2=b2)
    ref = eng.rollout(st, n_steps, policy=xla_policy)
    for f in ["s", "sd", "p", "q", "v"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )
    assert int(resets.sum()) == 0

    # Per-tile population: two tiles with different weights diverge.
    n_tiles = st.p.shape[-2] // ps.TILE_SUB
    W1p = jnp.stack([W1] + [1.5 * W1] * (n_tiles - 1))
    b1p = jnp.stack([b1] * n_tiles)
    W2p = jnp.stack([W2] + [1.5 * W2] * (n_tiles - 1))
    b2p = jnp.stack([b2] * n_tiles)
    run_pop = ps.build_pallas_env_rollout(
        eng, n_steps, mlp_policy=H, per_tile_weights=True,
        episode_length=10**6, healthy_z_range=(-1e6, 1e6),
    )
    with pltpu.force_tpu_interpret_mode():
        outp, _, _, _ = run_pop(st, W1=W1p, b1=b1p, W2=W2p, b2=b2p)
    # Tile 0 uses the original weights -> matches the XLA reference there.
    assert_allclose(
        outp.s[:, : ps.TILE_SUB], ref.s[:, : ps.TILE_SUB], rtol=1e-5, atol=1e-5
    )
    assert (
        float(
            jnp.abs(
                outp.s[:, ps.TILE_SUB :] - ref.s[:, ps.TILE_SUB :]
            ).max()
        )
        > 1e-6
    )


@pytest.mark.stress
def test_diff_pallas_rollout_hw_param_gradient():
    """Gradients w.r.t. the model parameters (link spatial inertias,
    contact points) flow through the differentiable Pallas rollout and
    match the XLA engine path — co-design with the fused forward
    (BASELINE config 4)."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(0)))
    import dataclasses as dc

    st = dc.replace(
        st, s=0.2 * jax.random.normal(jax.random.PRNGKey(1), st.s.shape)
    )
    base = eng.params()
    policy = lambda s: -30.0 * s.s - 0.3 * s.sd

    for chunk in (None, 2):
        rollout = ps.build_diff_pallas_rollout(eng, 4, checkpoint_chunk=chunk)

        def loss_pallas(Mscale):
            pr = {**base, "M": base["M"] * Mscale}
            out = rollout(st, policy, pr=pr)
            return jnp.mean(out.sd**2) + jnp.mean(out.p[2])

        def loss_engine(Mscale):
            pr = {**base, "M": base["M"] * Mscale}

            def body(s, _):
                return eng.step(s, policy(s), pr), None

            out, _ = jax.lax.scan(body, st, None, length=4)
            return jnp.mean(out.sd**2) + jnp.mean(out.p[2])

        with pltpu.force_tpu_interpret_mode():
            val, grad = jax.value_and_grad(loss_pallas)(1.0)
        rval, rgrad = jax.value_and_grad(loss_engine)(1.0)
        assert_allclose(val, rval, rtol=1e-5, atol=1e-6, err_msg=f"chunk={chunk}")
        assert_allclose(grad, rgrad, rtol=1e-4, atol=1e-7, err_msg=f"chunk={chunk}")
        assert float(jnp.abs(grad)) > 0.0

    # Contact-point gradient (morphology of the collision geometry):
    # spawn in penetration so the contacts actually engage.
    st = dc.replace(st, p=st.p.at[2].set(-0.01))
    rollout = ps.build_diff_pallas_rollout(eng, 3)

    def loss_cp(dz):
        pr = {**base, "cpoint": base["cpoint"] + jnp.array([0.0, 0.0, dz])}
        return jnp.mean(rollout(st, policy, pr=pr).p[2])

    def loss_cp_ref(dz):
        pr = {**base, "cpoint": base["cpoint"] + jnp.array([0.0, 0.0, dz])}

        def body(s, _):
            return eng.step(s, policy(s), pr), None

        out, _ = jax.lax.scan(body, st, None, length=3)
        return jnp.mean(out.p[2])

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss_cp)(0.0)
    rg = jax.grad(loss_cp_ref)(0.0)
    assert_allclose(g, rg, rtol=1e-4, atol=1e-7)
    assert float(jnp.abs(g)) > 0.0


# ----- rigid (QP) contacts in the engine -----


def _rigid_model(urdf, itype=None, mu=1.0):
    from jaxsim_tpu.api.model import IntegratorType
    from jaxsim_tpu.ops.contacts.rigid import RigidContacts, RigidContactsParams

    return js.JaxSimModel.build_from_model_description(
        urdf,
        contact_model=RigidContacts(),
        contact_params=RigidContactsParams.build(
            mu=mu, K=1e3, D=2 * np.sqrt(1e3)
        ),
        integrator=itype or IntegratorType.SemiImplicitEuler,
    )


def test_engine_rigid_box_settles():
    """A box dropped on rigid (QP) contacts lands ON the plane and stays:
    the APGD contact forces cancel gravity exactly (no penetration drift)
    and the inelastic impact projection removes touchdown velocity."""
    model = _rigid_model(models.build_box_urdf())
    eng = BatchedEngine.build(model)
    assert eng.contact_model == "rigid"
    st = eng.init_state(2, base_position=(0.0, 0.0, 0.08))
    out = jax.jit(
        lambda s: eng.rollout(s, 300, policy=lambda st_: jnp.zeros_like(st_.s))
    )(st)
    # Half-height 0.05; Baumgarte holds the box at the surface.
    assert np.all(np.asarray(out.p[2]) > 0.045)
    assert np.all(np.asarray(out.p[2]) < 0.055)
    assert np.all(np.abs(np.asarray(out.v)) < 0.02)


def test_engine_rigid_box_equivalence(prng_key):
    """Floating box landing on rigid contacts: the engine's matrix-free
    APGD + impact projection matches the generic ADMM + KKT-lstsq path
    (tier C — the solvers differ: cone projection vs pyramid
    linearization, so scenarios keep tangential forces inside both sets)."""
    model = _rigid_model(models.build_box_urdf())
    eng = BatchedEngine.build(model)

    B = 4
    keys = jax.random.split(prng_key, B)

    def build_one(k):
        kk = jax.random.split(k, 2)
        return js.JaxSimModelData.build(
            model,
            base_position=jnp.array([0.0, 0.0, 0.06])
            + 0.01 * jax.random.normal(kk[0], (3,)) * jnp.array([1, 1, 0.2]),
            base_linear_velocity=0.02 * jax.random.normal(kk[1], (3,)),
        )

    data = jax.vmap(build_one)(keys)
    step_ref = jax.jit(jax.vmap(lambda d: js.model.step(_generic(model), d)))
    step_eng = jax.jit(lambda s: eng.step(s))
    st = eng.state_from_data(data)
    for _ in range(5):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(data.base_position, jnp.moveaxis(st.p, -1, 0), rtol=1e-3, atol=1e-4)
    assert_allclose(data.base_quaternion, jnp.moveaxis(st.q, -1, 0), rtol=1e-3, atol=1e-4)
    assert_allclose(
        data.base_linear_velocity_inertial,
        jnp.moveaxis(st.v[0:3], -1, 0),
        rtol=2e-3,
        atol=5e-4,
    )


@pytest.mark.stress
@pytest.mark.parametrize("integrator_name", ["sie", "rk4"])
def test_engine_rigid_garpez_equivalence(integrator_name, prng_key):
    """Articulated floating-base model on rigid contacts (SIE and RK4):
    engine trajectories match the generic path (tier C/T)."""
    from jaxsim_tpu.api.model import IntegratorType

    itype = {
        "sie": IntegratorType.SemiImplicitEuler,
        "rk4": IntegratorType.RungeKutta4,
    }[integrator_name]
    model = _rigid_model(models.build_garpez_urdf(), itype)
    eng = BatchedEngine.build(model)
    n = model.number_of_joints()

    # The tilted low base puts two bottom corners in definite penetration
    # (at exactly delta == 0 the active set is discontinuous and
    # engine-vs-generic f32 FK noise flips it; airborne poses would not
    # exercise the contact solve at all).
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, 0.015]),
        base_quaternion=jnp.array([0.995, 0.0998, 0.0, 0.0]),
        joint_positions=0.05 * jax.random.normal(prng_key, (n,)),
    )
    data = jax.tree.map(lambda x: x[None], data)
    tau_fn = lambda s, sd: -20.0 * s - 0.1 * sd
    step_ref = jax.jit(
        jax.vmap(
            lambda d: js.model.step(
                _generic(model),
                d,
                joint_force_references=tau_fn(
                    d.joint_positions, d.joint_velocities
                ),
            )
        )
    )
    step_eng = jax.jit(lambda s: eng.step(s, tau_fn(s.s, s.sd)))
    st = eng.state_from_data(data)
    for _ in range(3):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(data.base_position, jnp.moveaxis(st.p, -1, 0), rtol=1e-3, atol=1e-4)
    assert_allclose(data.joint_positions, jnp.moveaxis(st.s, -1, 0), rtol=1e-3, atol=1e-4)
    assert_allclose(
        data.joint_velocities, jnp.moveaxis(st.sd, -1, 0), rtol=1e-2, atol=1e-2
    )


@pytest.mark.slow
def test_engine_relaxed_rigid_step_gradient():
    """Reverse-mode through the relaxed-rigid engine step is finite and
    matches finite differences: the PCG is differentiated implicitly via
    custom_linear_solve (unrolling its backward amplifies the Jacobi
    1/prec divisions on inactive points into NaN)."""
    import dataclasses as dc

    model = _rr_model(models.build_garpez_urdf())
    eng = dc.replace(BatchedEngine.build(model), rr_iterations=8)
    st0 = eng.init_state(1, base_position=(0.0, 0.0, 0.015))
    st0 = dc.replace(
        st0,
        q=jnp.array([0.995, 0.0998, 0.0, 0.0])[:, None]
        * jnp.ones_like(st0.q),
    )

    def loss(kp):
        st = st0
        for _ in range(3):
            st = eng.step(st, -kp * st.s - 0.1 * st.sd)
        return jnp.sum(st.sd**2) + jnp.sum(st.p**2)

    g = jax.jit(jax.grad(loss))(20.0)
    assert np.isfinite(float(g))
    fd = (loss(20.0 + 1e-2) - loss(20.0 - 1e-2)) / 2e-2
    assert_allclose(g, fd, rtol=0.15, atol=1e-9)


@pytest.mark.slow
def test_engine_rigid_step_gradient(prng_key):
    """Reverse-mode through the rigid engine step (APGD forces + impact
    projection) is finite and matches finite differences: both solves are
    differentiated implicitly via hand-written custom_vjps (Neumann series
    on the APGD fixed point; SPD-transpose CG for the projection —
    unrolling either backward explodes to NaN)."""
    import dataclasses as dc

    model = _rigid_model(models.build_garpez_urdf())
    eng = dc.replace(BatchedEngine.build(model), rigid_iterations=6)
    n = model.number_of_joints()
    s0 = 0.05 * jax.random.normal(prng_key, (n,))
    st0 = eng.init_state(1, base_position=(0.0, 0.0, 0.015))
    st0 = dc.replace(
        st0,
        s=s0[:, None] * jnp.ones_like(st0.s),
        q=jnp.array([0.995, 0.0998, 0.0, 0.0])[:, None]
        * jnp.ones_like(st0.q),
    )

    def loss(kp):
        st = st0
        for _ in range(2):
            st = eng.step(st, -kp * st.s - 0.1 * st.sd)
        return jnp.sum(st.s**2) + jnp.sum(st.sd**2)

    g = jax.jit(jax.grad(loss))(20.0)
    assert np.isfinite(float(g))
    eps = 1e-2
    fd = (loss(20.0 + eps) - loss(20.0 - eps)) / (2 * eps)
    # Tier A (AD vs FD).
    assert_allclose(g, fd, rtol=0.15, atol=1e-8)


@pytest.mark.stress
def test_pallas_rigid_interpret():
    """The fused Pallas step kernel runs the rigid APGD solve + impact
    projection in-kernel (interpret mode) and matches the XLA engine
    step."""
    import dataclasses as dc

    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = _rigid_model(models.build_garpez_urdf())
    eng = dc.replace(BatchedEngine.build(model), rigid_iterations=8)
    st = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.33)))
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    ref = eng.step(st, policy(st))
    with pltpu.force_tpu_interpret_mode():
        out = ps.build_pallas_step(eng, policy)(st)
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )


# ----- weld kinematic constraints on the hot path -----


def _weld_model(time_step=5e-4):
    from jaxsim_tpu.api.kin_dyn_parameters import ConstraintMap, ConstraintType
    from tests.test_contacts_constraints import _four_bar_urdf

    urdf = _four_bar_urdf()
    model0 = js.JaxSimModel.build_from_model_description(urdf)
    idx1 = js.frame.name_to_idx(model0, frame_name="tip_a")
    idx2 = js.frame.name_to_idx(model0, frame_name="tip_b")
    constraints = ConstraintMap().add_constraint(
        idx1, idx2, ConstraintType.Weld, K_P=100.0
    )
    return js.JaxSimModel.build_from_model_description(
        urdf, constraints=constraints, time_step=time_step
    )


def test_engine_weld_constraint_parallelogram():
    """BatchedEngine lowers weld constraints (matrix-free Delassus assembly
    + unrolled Cholesky): the four-bar tips stay coincident, both angles
    move together, and the trajectory tracks the generic js.model.step
    path. Tolerance is tier T widened one notch: the engine's rhs keeps
    the J̇ν bias the reference formulation drops (see
    BatchedEngine.constraint_wrenches), so transient constraint forces
    differ by O(ω·v) while both hold the same manifold."""
    model = _weld_model()
    eng = BatchedEngine.build(model)
    assert eng.n_constraints == 1

    data = js.JaxSimModelData.build(model, joint_positions=jnp.array([0.4, 0.4]))
    st = eng.state_from_data(jax.tree.map(lambda x: x[None], data))
    tau_eng = jnp.array([1.0, 0.0])[:, None]
    tau_gen = jnp.array([1.0, 0.0])

    step_eng = jax.jit(lambda s: eng.step(s, tau_eng))
    step_gen = jax.jit(
        lambda d: js.model.step(_generic(model), d, joint_force_references=tau_gen)
    )
    for _ in range(400):
        st = step_eng(st)
        data = step_gen(data)

    s = np.asarray(st.s[:, 0])
    assert np.all(np.isfinite(s))
    # The weld transmits the motion: both angles move together.
    assert abs(s[0] - s[1]) < 5e-2, s
    # The engine trajectory tracks the generic constrained path.
    assert_allclose(s, data.joint_positions, atol=5e-3)
    assert_allclose(st.sd[:, 0], data.joint_velocities, atol=5e-2)
    # And the tip frames stay coincident (evaluated via the generic API).
    data_eng = jax.tree.map(
        lambda x: x[0], eng.data_from_state(model, st)
    )
    idx1 = js.frame.name_to_idx(model, frame_name="tip_a")
    idx2 = js.frame.name_to_idx(model, frame_name="tip_b")
    H1 = js.frame.transform(model, data_eng, frame_index=idx1)
    H2 = js.frame.transform(model, data_eng, frame_index=idx2)
    assert_allclose(H1[0:3, 3], H2[0:3, 3], atol=5e-3)


@pytest.mark.slow
def test_engine_weld_step_gradient():
    """Reverse-mode through the constrained engine step is plain AD (the
    dense unrolled-Cholesky constraint solve needs no custom_vjp) and
    matches finite differences at tier A. (slow: the 3-step reverse graph
    through the weld solve is a ~1-minute compile on one core; the fused
    weld backward is TPU-covered by test_fused_diff_pallas_step_weld_tpu.)"""
    model = _weld_model()
    eng = BatchedEngine.build(model)
    data = js.JaxSimModelData.build(model, joint_positions=jnp.array([0.3, 0.3]))
    st0 = eng.state_from_data(jax.tree.map(lambda x: x[None], data))

    def loss(tau0):
        st = st0
        tau = jnp.stack([tau0 * jnp.ones(1), jnp.zeros(1)])
        for _ in range(3):
            st = eng.step(st, tau)
        # Velocity-only loss: the position term is ~constant over 3 steps
        # at dt=5e-4 and its f32 rounding would drown the FD signal.
        return jnp.sum(st.sd**2)

    g = jax.jit(jax.grad(loss))(1.0)
    assert np.isfinite(float(g))
    # The loss is exactly quadratic in tau0 (linear dynamics response over
    # the window), so a WIDE central difference is exact up to f32 noise.
    # (jit the FD side: the eager unrolled-solver dispatch chain costs more
    # than the compile it saves.)
    loss_j = jax.jit(loss)
    eps = 0.5
    fd = (loss_j(1.0 + eps) - loss_j(1.0 - eps)) / (2 * eps)
    # Tier A (AD vs FD).
    assert_allclose(g, fd, rtol=0.15, atol=1e-8)


@pytest.mark.stress
def test_pallas_step_weld_interpret():
    """The fused Pallas step runs the weld-constraint Delassus assembly +
    Cholesky solve in-kernel (interpret mode) and matches the XLA engine
    step, exercising the Mosaic-safe series branch of the SO(3) log."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = _weld_model()
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024))
    st = st.__class__(
        s=0.4 * jnp.ones_like(st.s),
        sd=jnp.zeros_like(st.sd),
        p=st.p,
        q=st.q,
        v=st.v,
        m=st.m,
    )
    policy = lambda s: jnp.stack([jnp.ones_like(s.s[0]), jnp.zeros_like(s.s[0])])
    ref = eng.step(st, policy(st))
    with pltpu.force_tpu_interpret_mode():
        out = ps.build_pallas_step(eng, policy)(st)
    for f in ["s", "sd", "p", "q", "v"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-4, atol=1e-5, err_msg=f
        )


# ----- spectral (Fourier) rough terrain on the hot path -----


def _fourier_model(urdf=None):
    from jaxsim_tpu.terrain import FourierTerrain

    terr = FourierTerrain.build(
        seed=3, num_components=6, amplitude=0.03, wavelength=0.8
    )
    return (
        js.JaxSimModel.build_from_model_description(
            urdf if urdf is not None else models.build_garpez_urdf(),
            terrain=terr,
        ),
        terr,
    )


def test_engine_fourier_terrain_equivalence():
    """BatchedEngine on FourierTerrain (per-point per-env analytic
    normals) matches the generic js.model.step path — the engine's
    in-loop spectrum evaluation is the same math as
    FourierTerrain.height/normal. (box model: the terrain lowering is
    morphology-independent and the garpez generic-step compile is the
    expensive part; articulation x terrain is covered by the slow/tpu
    fourier tests.)"""
    model, terr = _fourier_model(models.build_box_urdf())
    eng = BatchedEngine.build(model)
    assert eng.terrain_kind == "fourier"

    h0 = float(terr.height(jnp.array(0.0), jnp.array(0.0)))
    data = js.JaxSimModelData.build(
        model,
        # Low start: the box must actually CONTACT the rough terrain
        # within the short horizon for the comparison to be meaningful.
        base_position=jnp.array([0.0, 0.0, h0 + 0.05]),
        base_quaternion=jnp.array([0.995, 0.0998, 0.0, 0.0]),
    )
    st = eng.state_from_data(jax.tree.map(lambda a: a[None], data))
    step_g = jax.jit(lambda d: js.model.step(_generic(model), d))
    step_e = jax.jit(lambda s: eng.step(s))
    for _ in range(60):
        data = step_g(data)
        st = step_e(st)
    # Tier T (trajectories).
    assert_allclose(st.p[:, 0], data.base_position, atol=1e-4)
    assert_allclose(st.s[:, 0], data.joint_positions, atol=1e-4)
    assert_allclose(st.v[:, 0], jnp.concatenate([
        data.base_linear_velocity_inertial, data.base_angular_velocity_inertial
    ]), atol=1e-3)


def test_engine_fourier_terrain_per_env_offset():
    """pr["terrOff"] translates each env's terrain query independently —
    per-env rough-terrain domain randomization. A shifted env must settle
    at the height of the SHIFTED terrain location."""
    model, terr = _fourier_model(models.build_box_urdf())
    eng = BatchedEngine.build(model)
    B = 4
    st = eng.init_state(B, base_position=(0.0, 0.0, 0.4))
    pr = eng.params()
    off = jnp.stack([jnp.array([0.0, 1.3, -2.0, 0.7]), jnp.array([0.0, -0.4, 2.2, -1.1])])
    pr2 = {**pr, "terrOff": off}
    step = jax.jit(lambda s: eng.step(s, None, pr2))
    for _ in range(500):
        st = step(st)
    z = np.asarray(st.p[2])
    assert np.all(np.isfinite(z))
    # Each env settles near ITS shifted terrain height under the base.
    for b in range(B):
        hxy = float(
            terr.height(
                jnp.array(float(st.p[0, b]) - float(off[0, b])),
                jnp.array(float(st.p[1, b]) - float(off[1, b])),
            )
        )
        assert abs(z[b] - hxy) < 0.12, (b, z[b], hxy)
    # Different offsets → different terrain → distinct settled states.
    assert np.std(z) > 1e-4


@pytest.mark.stress
def test_pallas_step_fourier_interpret():
    """The fused Pallas step evaluates the terrain spectrum in-kernel
    (interpret mode) and matches the XLA engine step."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model, _ = _fourier_model()
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.28)))
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    ref = eng.step(st, policy(st))
    with pltpu.force_tpu_interpret_mode():
        out = ps.build_pallas_step(eng, policy)(st)
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )


@pytest.mark.tpu
def test_fused_diff_pallas_step_weld_tpu():
    """Fused BACKWARD kernel with weld constraints: the constraint solve
    is an unrolled Cholesky over a matrix-free Delassus assembly (no
    custom_vjp needed), so jax.vjp of the constrained step traces inside
    the Pallas kernel. Gradients match the XLA engine's."""
    from jaxsim_tpu.ops import pallas_step as ps

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (interpret-mode compile is pathological)")

    model = _weld_model()
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024))
    tau = 0.3 * jax.random.normal(
        jax.random.PRNGKey(11), (eng.n_joints,) + st.p.shape[1:]
    )
    fused = ps.build_fused_diff_pallas_step(eng)

    def loss_fused(tau_):
        new = fused(st, tau_)
        return jnp.sum(new.sd**2) + jnp.sum(new.s**2)

    def loss_engine(tau_):
        new = eng.step(st, tau_)
        return jnp.sum(new.sd**2) + jnp.sum(new.s**2)

    g = jax.jit(jax.grad(loss_fused))(tau)
    rg = jax.grad(loss_engine)(tau)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert_allclose(g, rg, rtol=1e-4, atol=1e-7, err_msg="grad tau")


@pytest.mark.tpu
def test_fused_diff_pallas_step_fourier_tpu():
    """Fused BACKWARD kernel on FourierTerrain: the spectral terrain is
    elementwise trig, so its vjp (cos/sin chains through the per-point
    normals) traces inside the Pallas kernel. Gradients match the XLA
    engine's."""
    from jaxsim_tpu.ops import pallas_step as ps

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (interpret-mode compile is pathological)")

    model, _ = _fourier_model()
    eng = BatchedEngine.build(model)
    st = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.02)))
    tau = 0.1 * jax.random.normal(
        jax.random.PRNGKey(13), (eng.n_joints,) + st.p.shape[1:]
    )
    fused = ps.build_fused_diff_pallas_step(eng)

    def loss_fused(tau_):
        new = fused(st, tau_)
        return jnp.sum(new.sd**2) + 0.1 * jnp.sum(new.v**2)

    def loss_engine(tau_):
        new = eng.step(st, tau_)
        return jnp.sum(new.sd**2) + 0.1 * jnp.sum(new.v**2)

    g = jax.jit(jax.grad(loss_fused))(tau)
    rg = jax.grad(loss_engine)(tau)
    assert bool(jnp.all(jnp.isfinite(g)))
    # On-silicon Mosaic-vs-XLA f32 ordering: measured r05 max rel 1.9e-2,
    # max abs 2.0e-5 (grad magnitudes ~1.7e-2); interpret-mode runs agree
    # far tighter — this tolerance is for the real-chip tier only.
    assert_allclose(g, rg, rtol=5e-2, atol=5e-5, err_msg="grad tau")


# ----- rough terrain × rigid / relaxed-rigid contacts; heightmap engine -----


def _bumpy_heightmap_terrain():
    from jaxsim_tpu.terrain import HeightmapTerrain

    xs = np.linspace(-3, 3, 61)
    ys = np.linspace(-3, 3, 61)
    X, Y = np.meshgrid(xs, ys)
    H = 0.05 * np.sin(1.7 * X) * np.cos(1.3 * Y)
    return HeightmapTerrain.build(heights=H, extent=(-3, 3, -3, 3))


def _ramp_heightmap_terrain():
    # Bilinear interpolation of a linear ramp is EXACT with a constant
    # gradient, so the engine's in-cell analytic normal and the generic
    # path's finite-difference normal agree to float32 rounding.
    from jaxsim_tpu.terrain import HeightmapTerrain

    xs = np.linspace(-3, 3, 31)
    H = np.broadcast_to(0.15 * xs, (31, 31)).copy()
    return HeightmapTerrain.build(heights=H, extent=(-3, 3, -3, 3))


def test_engine_heightmap_soft_equivalence():
    """BatchedEngine with heightmap terrain (bilinear lookup in params())
    matches the generic js.model.step path on a ramp grid (tier T)."""
    terr = _ramp_heightmap_terrain()
    model = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(), terrain=terr
    )
    eng = BatchedEngine.build(model)
    assert eng.terrain_kind == "heightmap"

    h0 = float(terr.height(jnp.array(0.0), jnp.array(0.0)))
    data = js.JaxSimModelData.build(
        model,
        base_position=jnp.array([0.0, 0.0, h0 + 0.04]),
        base_quaternion=jnp.array([0.995, 0.0998, 0.0, 0.0]),
    )
    st = eng.state_from_data(jax.tree.map(lambda a: a[None], data))
    step_g = jax.jit(lambda d: js.model.step(_generic(model), d))
    step_e = jax.jit(lambda s: eng.step(s))
    for _ in range(100):
        data = step_g(data)
        st = step_e(st)
    assert_allclose(st.p[:, 0], data.base_position, atol=2e-4)
    assert_allclose(st.q[:, 0], data.base_quaternion, atol=2e-4)


@pytest.mark.slow
def test_engine_heightmap_bumpy_settles():
    """Box batch settles ON a bumpy heightmap (each env at its local
    surface height) — the engine evaluates the grid per point per env."""
    terr = _bumpy_heightmap_terrain()
    model = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(), terrain=terr
    )
    eng = BatchedEngine.build(model)
    B = 4
    st = eng.init_state(B, base_position=(0.0, 0.0, 0.3))
    # Spread the envs over the terrain with per-env offsets.
    pr = {**eng.params(), "terrOff": jnp.stack([
        jnp.array([0.0, 0.9, -1.1, 0.4]), jnp.array([0.0, -0.5, 0.8, -1.2])
    ])}
    step = jax.jit(lambda s: eng.step(s, None, pr))
    for _ in range(600):
        st = step(st)
    z = np.asarray(st.p[2])
    assert np.all(np.isfinite(z))
    for b in range(B):
        h = float(terr.height(
            jnp.array(float(st.p[0, b]) - float(pr["terrOff"][0, b])),
            jnp.array(float(st.p[1, b]) - float(pr["terrOff"][1, b])),
        ))
        assert abs(z[b] - h) < 0.1, (b, z[b], h)
    assert np.std(z) > 1e-4


@pytest.mark.parametrize(
    "contact",
    [
        # rigid is slow-only: its generic APGD reference compile is the
        # expensive half, and the combos sweep below still smoke-covers
        # fourier x rigid in the default tier.
        pytest.param("rigid", marks=pytest.mark.slow),
        "relaxed_rigid",
    ],
)
def test_engine_fourier_terrain_hard_contacts_equivalence(contact, prng_key):
    """Rough (Fourier) terrain with rigid / relaxed-rigid contacts on the
    engine matches the generic path (tier C, short horizon): per-point
    batch-shaped normals feed the Baumgarte/impedance terms and the
    friction-cone projection is performed in the local contact frame."""
    from jaxsim_tpu.terrain import FourierTerrain

    terr = FourierTerrain.build(
        seed=5, num_components=4, amplitude=0.02, wavelength=1.1
    )
    if contact == "rigid":
        from jaxsim_tpu.ops.contacts.rigid import (
            RigidContacts,
            RigidContactsParams,
        )

        model = js.JaxSimModel.build_from_model_description(
            models.build_box_urdf(),
            terrain=terr,
            contact_model=RigidContacts(),
            contact_params=RigidContactsParams.build(
                mu=1.0, K=1e3, D=2 * np.sqrt(1e3)
            ),
        )
        eng = BatchedEngine.build(model)
    else:
        model = _rr_model(models.build_box_urdf())
        model = js.JaxSimModel.build_from_model_description(
            models.build_box_urdf(),
            terrain=terr,
            contact_model=model.contact_model,
        )
        eng = _rr_engine(model)
    assert eng.terrain_kind == "fourier"

    h0 = float(terr.height(jnp.array(0.0), jnp.array(0.0)))
    data = js.JaxSimModelData.build(
        model,
        # Definite penetration: at exactly delta == 0 the active set is
        # discontinuous and engine-vs-generic f32 FK noise flips it.
        base_position=jnp.array([0.0, 0.0, h0 + 0.04]),
        base_quaternion=jnp.array([0.995, 0.0998, 0.0, 0.0]),
    )
    data = jax.tree.map(lambda a: a[None], data)
    step_ref = jax.jit(jax.vmap(lambda d: js.model.step(_generic(model), d)))
    step_eng = jax.jit(lambda s: eng.step(s))
    st = eng.state_from_data(data)
    for _ in range(5):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(
        data.base_position, jnp.moveaxis(st.p, -1, 0), rtol=1e-3, atol=2e-4
    )
    assert_allclose(
        data.base_quaternion, jnp.moveaxis(st.q, -1, 0), rtol=1e-3, atol=2e-4
    )
    assert_allclose(
        data.base_linear_velocity_inertial,
        jnp.moveaxis(st.v[0:3], -1, 0),
        rtol=5e-3,
        atol=2e-3,
    )


@pytest.mark.tpu
def test_fused_rough_relaxed_rigid_touchdown_stable():
    """Regression (round 4): the humanoid dropped onto Fourier terrain with
    relaxed-rigid contacts must stay finite through the touchdown transient
    at scale. In round 4 warm-started budgets ≤ 16 iterations blew the
    whole batch up to NaN within ~20 steps of first contact; round 5's
    impedance floor + block-Jacobi preconditioner fixed the conditioning
    and ships ``min(3·nC, 16)`` with a measured 4× margin (docs/ops.md
    round-5 table). TPU-only: the fused kernel at B=1024 × 150 steps is
    the reproduction scale; small-scale CPU equivalence lives in
    ``test_engine_fourier_terrain_hard_contacts_equivalence``."""
    from jaxsim_tpu.ops import pallas_step as ps
    from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts
    from jaxsim_tpu.terrain import FourierTerrain

    if jax.default_backend() == "cpu":
        pytest.skip("requires TPU (fused kernel at B=1024)")

    model = js.JaxSimModel.build_from_model_description(
        models.build_humanoid_urdf(),
        terrain=FourierTerrain.build(
            seed=0, num_components=8, amplitude=0.04, wavelength=0.7
        ),
        contact_model=RelaxedRigidContacts(),
    )
    eng = BatchedEngine.build(model)
    # Round-5 budget: 16 with the impedance floor + rrKc block-Jacobi
    # preconditioner (the study measured finite touchdown down to 4).
    assert eng._rr_n_iter == 16
    assert eng._rr_Kc  # block preconditioner payload present
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(9)))
    run = jax.jit(ps.build_pallas_rollout(eng, 150, terr_off=False, tile_sub=8))
    o = run(st)
    assert bool(jnp.all(jnp.isfinite(o.p)).item())
    assert bool(jnp.all(jnp.isfinite(o.v)).item())


@pytest.mark.parametrize("contact", ["rigid", "relaxed_rigid"])
def test_engine_heightmap_hard_contacts_equivalence(contact, prng_key):
    """Heightmap terrain with rigid / relaxed-rigid contacts on the engine
    matches the generic path NUMERICALLY (VERDICT r03 missing #4 — these
    two combos previously had only a finite-step smoke check): the
    bilinear-grid normals feed the Baumgarte/impedance terms and the
    friction-cone projection runs in the local contact frame."""
    terr = _ramp_heightmap_terrain()
    if contact == "rigid":
        from jaxsim_tpu.ops.contacts.rigid import (
            RigidContacts,
            RigidContactsParams,
        )

        model = js.JaxSimModel.build_from_model_description(
            models.build_box_urdf(),
            terrain=terr,
            contact_model=RigidContacts(),
            contact_params=RigidContactsParams.build(
                mu=1.0, K=1e3, D=2 * np.sqrt(1e3)
            ),
        )
        eng = BatchedEngine.build(model)
    else:
        model = _rr_model(models.build_box_urdf())
        model = js.JaxSimModel.build_from_model_description(
            models.build_box_urdf(),
            terrain=terr,
            contact_model=model.contact_model,
        )
        eng = _rr_engine(model)
    assert eng.terrain_kind == "heightmap"

    h0 = float(terr.height(jnp.array(0.0), jnp.array(0.0)))
    data = js.JaxSimModelData.build(
        model,
        # Definite penetration (see the fourier twin: at delta == 0 the
        # active set is discontinuous under f32 FK noise).
        base_position=jnp.array([0.0, 0.0, h0 + 0.04]),
        base_quaternion=jnp.array([0.995, 0.0998, 0.0, 0.0]),
    )
    data = jax.tree.map(lambda a: a[None], data)
    step_ref = jax.jit(jax.vmap(lambda d: js.model.step(_generic(model), d)))
    step_eng = jax.jit(lambda s: eng.step(s))
    st = eng.state_from_data(data)
    for _ in range(5):
        data = step_ref(data)
        st = step_eng(st)
    assert_allclose(
        data.base_position, jnp.moveaxis(st.p, -1, 0), rtol=1e-3, atol=2e-4
    )
    assert_allclose(
        data.base_quaternion, jnp.moveaxis(st.q, -1, 0), rtol=1e-3, atol=2e-4
    )
    assert_allclose(
        data.base_linear_velocity_inertial,
        jnp.moveaxis(st.v[0:3], -1, 0),
        rtol=5e-3,
        atol=2e-3,
    )


@pytest.mark.parametrize("contact", ["soft", "rigid", "relaxed_rigid"])
@pytest.mark.parametrize("terrain_kind", ["plane", "fourier", "heightmap"])
def test_engine_accepts_all_terrain_contact_combos(terrain_kind, contact):
    """BatchedEngine.build accepts the full {plane, fourier, heightmap} ×
    {soft, rigid, relaxed-rigid} matrix and one step runs finite."""
    from jaxsim_tpu.terrain import FourierTerrain

    if terrain_kind == "plane":
        terr = None
    elif terrain_kind == "fourier":
        terr = FourierTerrain.build(
            seed=2, num_components=3, amplitude=0.02, wavelength=1.0
        )
    else:
        terr = _bumpy_heightmap_terrain()

    kwargs = {}
    if terr is not None:
        kwargs["terrain"] = terr
    if contact == "rigid":
        from jaxsim_tpu.ops.contacts.rigid import (
            RigidContacts,
            RigidContactsParams,
        )

        kwargs["contact_model"] = RigidContacts()
        kwargs["contact_params"] = RigidContactsParams.build(
            mu=1.0, K=1e3, D=2 * np.sqrt(1e3)
        )
    elif contact == "relaxed_rigid":
        from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts

        kwargs["contact_model"] = RelaxedRigidContacts()

    model = js.JaxSimModel.build_from_model_description(
        models.build_box_urdf(), **kwargs
    )
    eng = BatchedEngine.build(model)
    # One finite step is a SMOKE check: truncated solver unrolls keep the
    # 9-combo sweep's compile cost inside the default-tier budget (the
    # full-iteration solves are covered by the equivalence tests).
    import dataclasses as _dc

    eng = _dc.replace(eng, rigid_iterations=2, rr_iterations=2)
    assert eng.terrain_kind == terrain_kind
    st = eng.init_state(2, base_position=(0.0, 0.0, 0.05))
    out = jax.jit(lambda s: eng.step(s))(st)
    assert np.all(np.isfinite(np.asarray(out.p)))
    assert np.all(np.isfinite(np.asarray(out.v)))


# ----- interpret-mode coverage of the params-grad backward kernel -----


def _tiny_floating_model(**kwargs):
    """Smallest contact-bearing articulated model: floating sphere base
    (ONE collision point) + one revolute joint — keeps interpret-mode
    Pallas graphs small enough for the default tier."""
    import os

    from jaxsim_tpu.models.builders import (
        _joint,
        _link,
        _sphere_collision,
        _sphere_inertia,
    )

    old = os.environ.get("JAXSIM_COLLISION_SPHERE_POINTS")
    os.environ["JAXSIM_COLLISION_SPHERE_POINTS"] = "1"
    urdf = (
        '<robot name="tiny">'
        + _link(
            "base", 1.0, _sphere_inertia(1.0, 0.1),
            collision=_sphere_collision(0.1),
        )
        + _joint("j1", "revolute", "base", "tip", xyz=(0, 0, 0.15), axis=(0, 1, 0))
        + _link("tip", 0.3, _sphere_inertia(0.3, 0.05), com=(0, 0, 0.05))
        + "</robot>"
    )
    try:
        return js.JaxSimModel.build_from_model_description(urdf, **kwargs)
    finally:
        if old is None:
            os.environ.pop("JAXSIM_COLLISION_SPHERE_POINTS", None)
        else:
            os.environ["JAXSIM_COLLISION_SPHERE_POINTS"] = old


@pytest.mark.stress
def test_fused_diff_pallas_step_params_grad_interpret():
    """params_grad=True model cotangents (link inertias, contact points,
    joint placements) from the fused backward kernel match jax.grad of the
    XLA engine step — INTERPRET-MODE version of
    test_fused_diff_pallas_step_params_grad_tpu, so CPU CI covers the
    co-design gradient path. Slow tier: even on this 2-link model the
    interpret-mode backward graph takes ~18 min to compile on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = _tiny_floating_model()
    eng = BatchedEngine.build(model)
    assert eng.n_points == 1
    st = ps.tile_state(eng.init_state(1024, key=jax.random.PRNGKey(31)))
    import dataclasses as dc

    st = dc.replace(st, p=st.p.at[2].set(0.05))  # point in contact
    tau = 0.2 * jax.random.normal(
        jax.random.PRNGKey(32), (eng.n_joints,) + st.p.shape[1:]
    )
    pr = eng.params()
    step = ps.build_fused_diff_pallas_step(eng, params_grad=True)

    def loss_pallas(pr_):
        new = step(st, tau, pr_)
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    def loss_engine(pr_):
        new = eng.step(st, tau, {**eng.params(), **pr_})
        return jnp.sum(new.p[2]) + 0.1 * jnp.sum(new.sd**2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.jit(jax.grad(loss_pallas))(pr)
    rg = jax.jit(jax.grad(loss_engine))(pr)
    nonzero = 0
    for k in g:
        assert_allclose(
            g[k],
            rg[k],
            rtol=5e-3,
            atol=5e-4 * max(1.0, float(jnp.abs(rg[k]).max())),
            err_msg=f"param cotangent {k}",
        )
        nonzero += int(float(jnp.abs(jnp.asarray(g[k])).max()) > 0)
    assert nonzero >= 3  # inertias, contact point, joint placement all live


@pytest.mark.parametrize("contact", ["rigid", "relaxed_rigid"])
def test_engine_hard_contact_step_gradient_tiny(contact):
    """Default-tier AD coverage of the implicit contact-solver VJPs on the
    tiny 2-link model (the garpez versions are `slow`): reverse-mode
    through the engine step is finite and matches finite differences."""
    import dataclasses as dc

    if contact == "rigid":
        from jaxsim_tpu.ops.contacts.rigid import (
            RigidContacts,
            RigidContactsParams,
        )

        model = _tiny_floating_model(
            contact_model=RigidContacts(),
            contact_params=RigidContactsParams.build(
                mu=1.0, K=1e3, D=2 * np.sqrt(1e3)
            ),
        )
        eng = dc.replace(BatchedEngine.build(model), rigid_iterations=6)
    else:
        from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts

        model = _tiny_floating_model(contact_model=RelaxedRigidContacts())
        eng = dc.replace(BatchedEngine.build(model), rr_iterations=8)
    assert eng.n_points == 1
    st0 = eng.init_state(1, base_position=(0.0, 0.0, 0.08))
    # Nonzero joint angle: the policy torque (and hence the loss) must
    # depend on kp from the FIRST step, so a single step suffices for the
    # AD-vs-FD check (halving the reverse-mode graph the default tier
    # compiles on one core).
    import dataclasses as _dc

    st0 = _dc.replace(st0, s=0.3 * jnp.ones_like(st0.s))

    def loss(kp):
        st = eng.step(st0, -kp * st0.s - 0.1 * st0.sd)
        return jnp.sum(st.sd**2) + jnp.sum(st.p**2)

    g = jax.jit(jax.grad(loss))(15.0)
    assert np.isfinite(float(g))
    loss_j = jax.jit(loss)
    fd = (loss_j(15.0 + 1e-2) - loss_j(15.0 - 1e-2)) / 2e-2
    assert_allclose(g, fd, rtol=0.15, atol=1e-8)


# ----- per-env morphology (population co-design) in the engine -----


def test_per_env_morphology_matches_separate_engines():
    """per_env_hw_params: one engine stepping B differently-SCALED robots
    (per-env M / contact points / joint placements threaded through pr)
    matches B separately-built engines from update_hw_parameters — the
    population analog of reference ``api/model.py:2461-2593``."""
    import jaxsim_tpu.api as js
    from jaxsim_tpu.api.hw_parameters import ScalingFactors, with_hw_metadata

    model = with_hw_metadata(_tiny_floating_model())
    eng = BatchedEngine.build(model)
    nL = model.number_of_links()

    B = 2
    dims = jnp.stack(
        [
            jnp.ones((nL, 3)),
            jnp.concatenate(
                [0.9 * jnp.ones((nL // 2, 3)), 1.2 * jnp.ones((nL - nL // 2, 3))]
            ),
        ]
    )
    density = jnp.stack([jnp.ones(nL), 1.3 * jnp.ones(nL)])
    scalings = ScalingFactors(dims=dims, density=density)

    overrides = eng.per_env_hw_params(model, scalings)
    assert overrides["M"].shape == (nL, 6, 6, B)

    # Nonzero joints + near-ground start: free fall alone is morphology-
    # invariant, so the scenario must couple inertia/contact geometry.
    import dataclasses as dc

    s0 = jnp.array([0.4, -0.3, 0.25])[: eng.n_joints]
    # Low enough that the UNSCALED env's contact point (base sphere
    # r=0.1) starts penetrating while the 0.9-dims-scaled env's doesn't —
    # contact-geometry scaling shows up in the trajectories, not just
    # inertia scaling.
    st = eng.init_state(B, base_position=(0.0, 0.0, 0.095))
    st = dc.replace(st, s=s0[:, None] * jnp.ones_like(st.s))
    pr = {**eng.params(), **overrides}
    tau_fn = lambda s, sd: -8.0 * s - 0.2 * sd
    step_pop = jax.jit(lambda s: eng.step(s, tau_fn(s.s, s.sd), pr))
    for _ in range(40):
        st = step_pop(st)

    # Reference: one engine per scaled model, B=1 each.
    for b in range(B):
        sf_b = jax.tree.map(lambda a: a[b], scalings)
        model_b = js.model.update_hw_parameters(model, sf_b)
        eng_b = BatchedEngine.build(model_b)
        st_b = eng_b.init_state(1, base_position=(0.0, 0.0, 0.095))
        st_b = dc.replace(st_b, s=s0[:, None] * jnp.ones_like(st_b.s))
        step_b = jax.jit(lambda s, e=eng_b: e.step(s, tau_fn(s.s, s.sd)))
        for _ in range(40):
            st_b = step_b(st_b)
        assert_allclose(st.p[:, b], st_b.p[:, 0], rtol=1e-4, atol=1e-4)
        assert_allclose(st.s[:, b], st_b.s[:, 0], rtol=1e-4, atol=1e-4)
        assert_allclose(st.v[:, b], st_b.v[:, 0], rtol=1e-3, atol=1e-3)

    # The three morphologies genuinely diverge from each other (joint
    # trajectories are the sensitive observable over this short horizon).
    assert float(jnp.std(st.s, axis=-1).max()) > 1e-3


@pytest.mark.stress
def test_pallas_rollout_morph_interpret():
    """Per-env morphology tiles thread through the fused rollout kernel
    (interpret mode) and match the XLA engine with the same overrides.
    (slow: interpret-mode rollout; the XLA-level per-env morphology
    equivalence above stays in the default tier.)"""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.api.hw_parameters import ScalingFactors, with_hw_metadata
    from jaxsim_tpu.ops import pallas_step as ps

    model = with_hw_metadata(_tiny_floating_model())
    eng = BatchedEngine.build(model)
    B = 1024
    nL = model.number_of_links()
    key = jax.random.PRNGKey(44)
    scalings = ScalingFactors(
        dims=1.0 + 0.2 * jax.random.uniform(key, (B, nL, 3)),
        density=1.0 + 0.3 * jax.random.uniform(jax.random.fold_in(key, 1), (B, nL)),
    )
    ov = eng.per_env_hw_params(model, scalings)

    st = eng.init_state(B, base_position=(0.0, 0.0, 0.08))
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    pr = {**eng.params(), **ov}
    ref = jax.jit(lambda s: eng.rollout(s, 2, policy=policy, domain=ov))(st)

    tile = lambda tree: jax.tree.map(
        lambda a: a.reshape(a.shape[:-1] + (a.shape[-1] // 128, 128)), tree
    )
    with pltpu.force_tpu_interpret_mode():
        out = ps.untile_state(
            ps.build_pallas_rollout(eng, 2, policy, morph=True)(
                ps.tile_state(st), **tile(ov)
            )
        )
    for f in ["s", "sd", "p", "q", "v", "m"]:
        assert_allclose(
            getattr(out, f), getattr(ref, f), rtol=1e-5, atol=1e-5, err_msg=f
        )
