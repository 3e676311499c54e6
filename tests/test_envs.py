"""Auto-resetting batched RL environment tests."""

import jax
import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.envs import BatchedEnv
from jaxsim_tpu.ops.batched_engine import BatchedEngine


def _env(**kwargs):
    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    kwargs.setdefault("healthy_z_range", (0.05, 2.0))
    return BatchedEnv(engine=eng, reset_base_position=(0.0, 0.0, 0.35), **kwargs)


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
