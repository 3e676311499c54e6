"""Example: rough-terrain RL evaluation with per-env terrain patches.

``FourierTerrain`` is a spectral height field — height and analytic
normal are pure elementwise trig over a static spectrum, so the fused
Pallas kernel evaluates the terrain INSIDE the rollout (a grid heightmap
cannot: Mosaic has no gather). ``domain={"terrOff": (2, B)}`` translates
each env's terrain query, giving every env its own rough-terrain patch —
the standard recipe for terrain-randomized locomotion — at the cost of
two subtracts per contact point.

Run:  PYTHONPATH=. python examples/rough_terrain_rl.py
"""

import os

import jax
import jax.numpy as jnp

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.envs import BatchedEnv
from jaxsim_tpu.ops.batched_engine import BatchedEngine
from jaxsim_tpu.terrain import FourierTerrain

# Smoke mode (set by tests/test_examples.py): shrink the workload so the
# example runs in seconds while exercising the same API surface.
_SMOKE = os.environ.get("JAXSIM_EXAMPLE_SMOKE", "0") == "1"
BATCH = 128 if _SMOKE else 4096
STEPS = 10 if _SMOKE else 500


def main():
    terrain = FourierTerrain.build(
        seed=0, num_components=8, amplitude=0.04, wavelength=0.7
    )
    model = js.JaxSimModel.build_from_model_description(
        models.build_garpez_urdf(), terrain=terrain
    )
    env = BatchedEnv(
        engine=BatchedEngine.build(model),
        reset_base_position=(0.0, 0.0, 0.34),
        healthy_z_range=(0.05, 2.0),
        episode_length=5 if _SMOKE else 250,
    )

    # Every env gets its own terrain patch (translated query), resampled
    # per evaluation — the policy cannot overfit one height field.
    key = jax.random.PRNGKey(1)
    terr_off = 10.0 * jax.random.normal(key, (2, BATCH))

    policy = lambda s: -8.0 * s.s - 0.2 * s.sd  # PD stand-in for a policy
    final, reward_sum, resets = env.fused_eval_rollout(
        jax.random.PRNGKey(2),
        BATCH,
        STEPS,
        policy=policy,
        domain={
            "terrOff": terr_off,
            # Compose with dynamics randomization: ±30% ground stiffness.
            "Kmul": jnp.exp(
                0.3 * jax.random.normal(jax.random.PRNGKey(3), (BATCH,))
            ),
        },
    )
    print(
        f"mean reward {float(reward_sum.mean()):.2f} | "
        f"episodes ended {int(resets.sum())} | "
        f"mean final height {float(final.p[2].mean()):.3f}"
    )


if __name__ == "__main__":
    main()
