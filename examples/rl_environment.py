"""Example: auto-resetting batched RL environment on the fast engine.

A 23-DoF humanoid "stay upright" task: 512 parallel envs, PD-ish random
policy, per-env termination (base height) + truncation with in-step
auto-reset — the full environment loop stays inside one jitted scan.

Run:  PYTHONPATH=. python examples/rl_environment.py
"""

import os

import jax
import jax.numpy as jnp

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.envs import BatchedEnv
from jaxsim_tpu.ops.batched_engine import BatchedEngine


def main():
    # Smoke mode (set by tests/test_examples.py): shrink the workload so
    # the example runs in seconds while exercising the same API surface.
    smoke = os.environ.get("JAXSIM_EXAMPLE_SMOKE", "0") == "1"
    build = models.build_garpez_urdf if smoke else models.build_humanoid_urdf
    model = js.JaxSimModel.build_from_model_description(build())
    model = model.replace(
        contact_params=js.contact.estimate_good_contact_parameters(
            model,
            number_of_active_collidable_points_steady_state=8,
            max_penetration=0.006,
            damping_ratio=0.15,
        )
    )
    env = BatchedEnv(
        engine=BatchedEngine.build(model),
        episode_length=5 if smoke else 150,
        healthy_z_range=(0.5, 1.5),
        reset_base_position=(0.0, 0.0, 0.9),
    )

    B = 32 if smoke else 512
    state, obs = env.reset(jax.random.PRNGKey(0), B)
    n = env.action_size

    # A weak PD policy with exploration noise. Every env truncates at the
    # 150-step horizon (and any fall terminates early); both auto-reset
    # in place, so the scan below never leaves the device.
    key = jax.random.PRNGKey(1)
    noise = 2.0 * jax.random.normal(key, (n, B))
    policy = lambda obs: -20.0 * obs[:n] - 0.2 * obs[n : 2 * n] + noise

    final, (obs_traj, rew_traj, done_traj) = jax.jit(
        lambda s: env.rollout(s, policy, 12 if smoke else 200)
    )(state)
    jax.block_until_ready(rew_traj)

    resets = int(done_traj.sum())
    print(f"rolled {B} envs x 200 steps on {jax.devices()[0].platform}")
    print(f"mean reward: {float(rew_traj.mean()):.4f}")
    print(f"episode ends (auto-resets): {resets}")
    print(f"all finite: {bool(jnp.isfinite(obs_traj).all())}")
    assert resets > 0  # the task actually terminates episodes


if __name__ == "__main__":
    main()
