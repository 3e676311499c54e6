"""Auto-resetting batched RL environment tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.envs import BatchedEnv
from jaxsim_tpu.ops.batched_engine import BatchedEngine


@pytest.fixture(scope="module")
def garpez_fourier():
    """(terrain, engine) for the garpez model on rough FourierTerrain —
    shared by every rough-terrain env test in this module."""
    from jaxsim_tpu.terrain import FourierTerrain

    terr = FourierTerrain.build(
        seed=5, num_components=3, amplitude=0.05, wavelength=0.6
    )
    model = js.JaxSimModel.build_from_model_description(
        models.build_garpez_urdf(), terrain=terr
    )
    return terr, BatchedEngine.build(model)


@pytest.fixture(scope="module")
def tiny_engine():
    """Smallest contact-bearing engine — keeps the interpret-mode kernel
    test (whose cost scales with ops × steps) inside the fast tier."""
    from tests.test_batched_engine import _tiny_floating_model

    return BatchedEngine.build(_tiny_floating_model())


def _env_from(eng, **kwargs):
    kwargs.setdefault("healthy_z_range", (0.05, 2.0))
    return BatchedEnv(engine=eng, reset_base_position=(0.0, 0.0, 0.35), **kwargs)


_FLAT_ENGINE_CACHE = []


def _env(**kwargs):
    # Tiny 2-link model: the env plumbing under test (obs layout, reward,
    # auto-reset) is morphology-independent, and each env config below
    # compiles its own step graph on a single core.
    if not _FLAT_ENGINE_CACHE:
        from tests.test_batched_engine import _tiny_floating_model

        _FLAT_ENGINE_CACHE.append(BatchedEngine.build(_tiny_floating_model()))
    return _env_from(_FLAT_ENGINE_CACHE[0], **kwargs)


def test_reset_and_step_shapes():
    env = _env()
    B = 4
    state, obs = env.reset(jax.random.PRNGKey(0), B)
    n = env.action_size
    assert obs.shape == (2 * n + 4 + 6 + 1, B)

    state, obs, reward, done = jax.jit(env.step)(state, jnp.zeros((n, B)))
    assert obs.shape[-1] == B and reward.shape == (B,) and done.shape == (B,)
    assert np.all(np.asarray(state.steps) == 1)
    assert not np.any(np.asarray(done))


def test_truncation_auto_reset():
    env = _env(episode_length=3, reset_noise_std=0.0)
    B = 2
    state, _ = env.reset(jax.random.PRNGKey(0), B)
    step = jax.jit(env.step)
    act = jnp.zeros((env.action_size, B))
    for i in range(3):
        state, obs, reward, done = step(state, act)
    # Step 3 truncates: done flags, counters reset, base back at start.
    assert np.all(np.asarray(done))
    assert np.all(np.asarray(state.steps) == 0)
    np.testing.assert_allclose(
        np.asarray(state.sim.p[2]), 0.35, rtol=0, atol=1e-6
    )
    state, obs, reward, done = step(state, act)
    assert not np.any(np.asarray(done)) and np.all(np.asarray(state.steps) == 1)


def test_termination_auto_reset():
    # Impossible healthy range: every step terminates and respawns.
    env = _env(healthy_z_range=(10.0, 20.0), reset_noise_std=0.0)
    state, _ = env.reset(jax.random.PRNGKey(1), 2)
    state, obs, reward, done = jax.jit(env.step)(
        state, jnp.zeros((env.action_size, 2))
    )
    assert np.all(np.asarray(done))
    np.testing.assert_allclose(np.asarray(state.sim.p[2]), 0.35, atol=1e-6)


@pytest.mark.slow
def test_pallas_env_rollout_interpret_matches_reference(tiny_engine):
    """The in-kernel auto-resetting eval rollout matches a plain-jnp loop
    with identical semantics (interpret mode, tiny model — the reset
    plumbing is morphology-independent and interpret cost scales with the
    op count of the stepped model)."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    eng = tiny_engine
    st = eng.init_state(1024, base_position=(0.0, 0.0, 0.35))
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    # 3 steps with horizon 2: the truncation fires mid-rollout, so the
    # respawned state is itself stepped again inside the kernel.
    n_steps, ep_len, z_rng = 3, 2, (0.05, 2.0)

    # Reference: same semantics in plain jnp over the engine step.
    @jax.jit
    def xla_ref(init):
        sim, steps = init, jnp.zeros(1024, dtype=jnp.int32)
        rew_sum = jnp.zeros(1024)
        resets = jnp.zeros(1024, dtype=jnp.int32)
        for _ in range(n_steps):
            tau = policy(sim)
            new = eng.step(sim, tau)
            steps = steps + 1
            z = new.p[2]
            done = (z < z_rng[0]) | (z > z_rng[1]) | (steps >= ep_len)
            rew_sum = (
                rew_sum
                + jnp.minimum(new.p[2], 2.0)
                - 0.001 * jnp.sum(tau * tau, axis=0)
            )
            sim = jax.tree.map(lambda f, n_: jnp.where(done, f, n_), init, new)
            steps = jnp.where(done, 0, steps)
            resets = resets + done.astype(jnp.int32)
        return sim, steps, rew_sum, resets

    sim, steps, rew_sum, resets = xla_ref(st)

    run = ps.build_pallas_env_rollout(
        eng, n_steps, policy=policy, episode_length=ep_len,
        healthy_z_range=z_rng,
    )
    with pltpu.force_tpu_interpret_mode():
        out, rew_k, resets_k, steps_k = run(ps.tile_state(st))
    out = ps.untile_state(out)

    flat = lambda a: np.asarray(a).reshape(a.shape[:-2] + (-1,))
    assert np.asarray(resets).sum() > 0  # the scenario actually resets
    np.testing.assert_array_equal(flat(resets_k), np.asarray(resets))
    np.testing.assert_array_equal(flat(steps_k), np.asarray(steps))
    np.testing.assert_allclose(flat(rew_k), np.asarray(rew_sum), rtol=1e-5, atol=1e-5)
    for f in ["s", "sd", "p", "q", "v", "m"]:
        np.testing.assert_allclose(
            np.asarray(getattr(out, f)),
            np.asarray(getattr(sim, f)),
            rtol=1e-5, atol=1e-5, err_msg=f,
        )


@pytest.mark.stress
def test_pallas_env_rollout_linear_policy():
    """tau = W@obs + b with call-time weights matches the closure policy,
    and swapping weights does NOT retrace the kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    n = eng.n_joints
    d = ps.obs_dim(n)
    st0 = eng.init_state(1024, base_position=(0.0, 0.0, 0.35))
    st = ps.tile_state(st0)

    key = jax.random.PRNGKey(3)
    W = 0.1 * jax.random.normal(key, (n, d))
    b = 0.05 * jax.random.normal(jax.random.split(key)[0], (n, 1))

    def policy_flat(sim):
        obs = jnp.concatenate(
            [sim.s, sim.sd, sim.q, sim.v, sim.p[2:3]], axis=0
        )
        return W @ obs + b

    # Reference: identical env semantics in plain jnp over the engine step.
    ep_len, z_rng = 3, (0.05, 2.0)
    init, sim = st0, st0
    steps = jnp.zeros(1024, dtype=jnp.int32)
    rew_ref = jnp.zeros(1024)
    resets_ref = jnp.zeros(1024, dtype=jnp.int32)
    for _ in range(4):
        tau = policy_flat(sim)
        new = eng.step(sim, tau)
        steps = steps + 1
        done = (new.p[2] < z_rng[0]) | (new.p[2] > z_rng[1]) | (steps >= ep_len)
        rew_ref = rew_ref + jnp.minimum(new.p[2], 2.0) - 0.001 * jnp.sum(tau * tau, axis=0)
        sim = jax.tree.map(lambda f, n_: jnp.where(done, f, n_), init, new)
        steps = jnp.where(done, 0, steps)
        resets_ref = resets_ref + done.astype(jnp.int32)

    kw = dict(episode_length=ep_len, healthy_z_range=z_rng)
    run_linear = jax.jit(
        ps.build_pallas_env_rollout(eng, 4, linear_policy=True, **kw)
    )
    flat = lambda a: np.asarray(a).reshape(-1)
    with pltpu.force_tpu_interpret_mode():
        _, rew_l, resets_l, _ = run_linear(st, W, b)
        np.testing.assert_allclose(
            flat(rew_l), np.asarray(rew_ref), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(flat(resets_l), np.asarray(resets_ref))

        # New weights, same compiled kernel.
        _, rew_2, _, _ = run_linear(st, 2.0 * W, b)
        assert run_linear._cache_size() == 1
        assert not np.allclose(np.asarray(rew_2), np.asarray(rew_l))

    import pytest

    with pytest.raises(ValueError, match="W must have shape"):
        run_linear(st, jnp.zeros((n, d + 1)), b)


@pytest.mark.stress
def test_in_kernel_stochastic_resets():
    """reset_noise > 0 builds/runs and perturbs respawns; reset_noise = 0
    keeps respawns exact. NOTE: interpret-mode prng_random_bits returns
    zeros, so the noise DISTRIBUTION can only be validated on real TPU
    (test_in_kernel_stochastic_resets_tpu); here the noise path shows up
    as the constant lower-bound offset."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    mk = lambda: ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.35)))

    kw = dict(episode_length=2, healthy_z_range=(0.05, 2.0))
    run = ps.build_pallas_env_rollout(eng, 6, reset_noise=0.02, **kw)
    with pltpu.force_tpu_interpret_mode():
        out, _, resets, steps = run(mk(), seed=7)

    # Step 6 truncates: final state is a fresh respawn with noise applied.
    assert np.asarray(resets).min() == 3 and np.asarray(steps).max() == 0
    assert np.abs(np.asarray(out.p[0])).max() > 0.005  # offset applied

    # reset_noise=0 keeps exact respawns.
    run0 = ps.build_pallas_env_rollout(eng, 6, **kw)
    with pltpu.force_tpu_interpret_mode():
        out0, _, _, _ = run0(mk())
    np.testing.assert_allclose(np.asarray(out0.p[0]), 0.0, atol=1e-7)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs real TPU PRNG"
)
def test_in_kernel_stochastic_resets_tpu():
    """On real hardware the respawn noise is per-env and seed-dependent."""
    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    mk = lambda: ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.35)))
    run = jax.jit(ps.build_pallas_env_rollout(
        eng, 6, reset_noise=0.02, episode_length=2,
        healthy_z_range=(0.05, 2.0),
    ), static_argnames=())
    out, _, _, _ = run(mk(), seed=7)
    out2, _, _, _ = run(mk(), seed=8)
    x = np.asarray(out.p[0]).ravel()
    assert 0.005 < x.std() < 0.05
    assert not np.allclose(np.asarray(out.p[0]), np.asarray(out2.p[0]))


@pytest.mark.stress
def test_per_tile_population_weights():
    """One launch with per-tile W evaluates each policy candidate on its own
    1024-env tile, matching separate single-policy launches."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    n, d = eng.n_joints, ps.obs_dim(eng.n_joints)

    key = jax.random.PRNGKey(11)
    W_pop = 0.1 * jax.random.normal(key, (2, n, d))  # two candidates
    b_pop = jnp.zeros((2, n, 1))

    kw = dict(episode_length=4, healthy_z_range=(0.05, 2.0))
    st2 = ps.tile_state(eng.init_state(2048, base_position=(0.0, 0.0, 0.35)))
    run_pop = ps.build_pallas_env_rollout(
        eng, 5, linear_policy=True, per_tile_weights=True, **kw
    )
    st1 = ps.tile_state(eng.init_state(1024, base_position=(0.0, 0.0, 0.35)))
    run_one = ps.build_pallas_env_rollout(eng, 5, linear_policy=True, **kw)

    with pltpu.force_tpu_interpret_mode():
        _, rew_pop, _, _ = run_pop(st2, W_pop, b_pop)
        _, rew_0, _, _ = run_one(st1, W_pop[0], b_pop[0])
        _, rew_1, _, _ = run_one(st1, W_pop[1], b_pop[1])

    np.testing.assert_allclose(
        np.asarray(rew_pop[:8]), np.asarray(rew_0), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rew_pop[8:]), np.asarray(rew_1), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(rew_0), np.asarray(rew_1))

    import pytest

    with pytest.raises(ValueError, match="per-tile W"):
        run_pop(st2, W_pop[0], b_pop[0])
    with pytest.raises(ValueError, match="requires linear_policy"):
        ps.build_pallas_env_rollout(eng, 5, per_tile_weights=True, **kw)


@pytest.mark.stress
def test_fused_eval_rollout_wrapper():
    from jax.experimental.pallas import tpu as pltpu

    env = _env(episode_length=3, reset_noise_std=0.0)
    with pltpu.force_tpu_interpret_mode():
        final, rew, resets = env.fused_eval_rollout(
            jax.random.PRNGKey(0), 1024, 5,
            policy=lambda s: -5.0 * s.s - 0.1 * s.sd,
        )
    assert rew.shape == (1024,) and resets.shape == (1024,)
    assert np.isfinite(np.asarray(rew)).all()
    assert np.asarray(resets).min() == 1  # one truncation in 5 steps, horizon 3

    # Linear-policy mode through the same wrapper.
    from jaxsim_tpu.ops import pallas_step as ps

    n = env.engine.n_joints
    W = jnp.zeros((n, ps.obs_dim(n)))
    with pltpu.force_tpu_interpret_mode():
        _, rew_w, resets_w = env.fused_eval_rollout(
            jax.random.PRNGKey(0), 1024, 5, W=W
        )
    assert np.isfinite(np.asarray(rew_w)).all()

    # Domain randomization composes with the linear policy: different
    # stiffness multipliers change the outcome through the same kernel.
    # Spawn in penetration so the contacts actually engage.
    import dataclasses

    env_c = dataclasses.replace(
        _env(reset_noise_std=0.0, healthy_z_range=(-1.0, 2.0)),
        reset_base_position=(0.0, 0.0, -0.01),
    )
    k1 = jnp.ones(1024)
    k2 = jnp.exp(0.5 * jax.random.normal(jax.random.PRNGKey(9), (1024,)))
    with pltpu.force_tpu_interpret_mode():
        _, rA, _ = env_c.fused_eval_rollout(
            jax.random.PRNGKey(0), 1024, 5, W=W, domain={"Kmul": k1}
        )
        _, rB, _ = env_c.fused_eval_rollout(
            jax.random.PRNGKey(0), 1024, 5, W=W, domain={"Kmul": k2}
        )
    assert np.isfinite(np.asarray(rA)).all() and np.isfinite(np.asarray(rB)).all()
    assert not np.allclose(np.asarray(rA), np.asarray(rB))

    import pytest

    with pytest.raises(ValueError, match="multiple of"):
        env.fused_eval_rollout(jax.random.PRNGKey(0), 100, 5)
    with pytest.raises(ValueError, match="exactly one"):
        env.fused_eval_rollout(
            jax.random.PRNGKey(0), 1024, 5, policy=lambda s: s.s, W=W
        )
    with pytest.raises(ValueError, match="unknown domain"):
        env.fused_eval_rollout(
            jax.random.PRNGKey(0), 1024, 5, domain={"Kscale": k1}
        )


@pytest.mark.slow
def test_scan_rollout_with_policy():
    env = _env(episode_length=10)
    state, _ = env.reset(jax.random.PRNGKey(2), 4)

    policy = lambda obs: -0.5 * obs[: env.action_size]  # PD on joint positions
    final, (obs_traj, rew_traj, done_traj) = jax.jit(
        lambda s: env.rollout(s, policy, 25)
    )(state)

    assert rew_traj.shape == (25, 4)
    assert np.isfinite(np.asarray(obs_traj)).all()
    # Two truncations happen inside 25 steps with horizon 10.
    assert np.asarray(done_traj).sum(axis=0).min() == 2


@pytest.mark.stress
def test_fused_eval_rollout_mlp_weights():
    """BatchedEnv.fused_eval_rollout(mlp_weights=...) runs the in-kernel
    tanh-MLP policy (interpret mode) and produces finite rewards that
    depend on the weights."""
    from jax.experimental.pallas import tpu as pltpu

    from jaxsim_tpu.ops import pallas_step as ps

    env = _env()
    n = env.engine.n_joints
    H, d = 4, ps.obs_dim(n)
    key = jax.random.PRNGKey(0)
    mk = lambda k, shape, s: s * jax.random.normal(jax.random.fold_in(key, k), shape)
    w1 = (mk(1, (H, d), 0.3), mk(2, (H, 1), 0.1), mk(3, (n, H), 0.5), mk(4, (n, 1), 0.1))
    w2 = tuple(2.0 * a for a in w1)
    with pltpu.force_tpu_interpret_mode():
        _, rew1, _ = env.fused_eval_rollout(
            jax.random.PRNGKey(5), ps.TILE_ENVS, 3, mlp_weights=w1
        )
        _, rew2, _ = env.fused_eval_rollout(
            jax.random.PRNGKey(5), ps.TILE_ENVS, 3, mlp_weights=w2
        )
    assert np.all(np.isfinite(np.asarray(rew1)))
    assert float(jnp.abs(rew1 - rew2).max()) > 1e-8

    with pytest.raises(ValueError, match="exactly one"):
        env.fused_eval_rollout(
            jax.random.PRNGKey(5), ps.TILE_ENVS, 3,
            W=jnp.zeros((n, d)), mlp_weights=w1,
        )


@pytest.mark.stress
def test_fused_eval_rollout_rough_terrain_offsets(garpez_fourier):
    """domain={"terrOff": (2, B)} gives every env its own FourierTerrain
    patch inside the fused eval kernel: zero offsets match the
    offset-free kernel exactly, distinct offsets change outcomes."""
    from jax.experimental.pallas import tpu as pltpu

    _, eng = garpez_fourier
    # Spawn in penetration so contacts (and therefore the terrain) engage
    # within the short horizon.
    env = BatchedEnv(
        engine=eng,
        reset_base_position=(0.0, 0.0, 0.02),
        reset_noise_std=0.0,
        healthy_z_range=(-1.0, 2.0),
    )
    policy = lambda s: -5.0 * s.s - 0.1 * s.sd
    B = 1024
    with pltpu.force_tpu_interpret_mode():
        _, r0, _ = env.fused_eval_rollout(
            jax.random.PRNGKey(0), B, 2, policy=policy
        )
        _, rz, _ = env.fused_eval_rollout(
            jax.random.PRNGKey(0), B, 2, policy=policy,
            domain={"terrOff": jnp.zeros((2, B))},
        )
        off = 2.0 * jax.random.normal(jax.random.PRNGKey(3), (2, B))
        _, ro, _ = env.fused_eval_rollout(
            jax.random.PRNGKey(0), B, 2, policy=policy,
            domain={"terrOff": off},
        )
    assert np.allclose(np.asarray(r0), np.asarray(rz), atol=1e-6)
    assert np.isfinite(np.asarray(ro)).all()
    assert not np.allclose(np.asarray(r0), np.asarray(ro))


def _terrain_relative_env(eng):
    return BatchedEnv(
        engine=eng,
        reset_base_position=(0.0, 0.0, 0.30),
        reset_noise_std=0.0,
        healthy_z_range=(0.05, 2.0),
        terrain_relative=True,
    )


def test_terrain_relative_obs_and_termination(garpez_fourier):
    """terrain_relative=True: the default observation's height row and the
    healthy-height termination use p_z − h(x, y) (XLA path)."""
    terr, eng = garpez_fourier

    with pytest.raises(ValueError, match="FourierTerrain"):
        BatchedEnv(engine=_env().engine, terrain_relative=True)

    env = _terrain_relative_env(eng)
    st, obs = env.reset(jax.random.PRNGKey(0), 8)
    # The obs height row is terrain-relative: subtracting h(x, y) by hand
    # from the absolute height reproduces it.
    h = np.asarray(terr.height(st.sim.p[0], st.sim.p[1]))
    assert np.allclose(
        np.asarray(obs[-1]), np.asarray(st.sim.p[2]) - h, atol=1e-6
    )


@pytest.mark.stress
def test_terrain_relative_fused_matches_xla(garpez_fourier):
    """The fused kernel's terrain-relative observation/termination matches
    the XLA env path step for step (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    _, eng = garpez_fourier
    env = _terrain_relative_env(eng)

    from jaxsim_tpu.ops import pallas_step as ps

    n = eng.n_joints
    W = jnp.zeros((n, ps.obs_dim(n)))
    n_steps = 3
    with pltpu.force_tpu_interpret_mode():
        final, rew, resets = env.fused_eval_rollout(
            jax.random.PRNGKey(0), 1024, n_steps, W=W
        )
    assert np.isfinite(np.asarray(rew)).all()

    # XLA reference: same zero policy, same respawn state, same horizon.
    @jax.jit
    def xla_ref(st2):
        r_sum = jnp.zeros(1024)
        for _ in range(n_steps):
            st2, _, r, _ = env.step(st2, jnp.zeros((n, 1024)))
            r_sum = r_sum + r
        return r_sum

    st2, _ = env.reset(jax.random.PRNGKey(1), 1024)
    assert np.allclose(np.asarray(rew), np.asarray(xla_ref(st2)), atol=1e-4)
