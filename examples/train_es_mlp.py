"""Example: evolution strategies over a NONLINEAR policy, fully on-device.

OpenAI-ES over a one-hidden-layer tanh MLP ``tau = W2 tanh(W1 obs + b1) + b2``
for the 23-DoF humanoid. Every generation is ONE fused kernel launch: each
candidate's weights live on their own env tile (SMEM), the physics + MLP +
termination/truncation/auto-reset all run in-kernel (~2% slower than the
bare physics), and updated weights do NOT recompile the kernel.

Run:  PYTHONPATH=. python examples/train_es_mlp.py
"""

import numpy as np
import os

import jax
import jax.numpy as jnp

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.ops import pallas_step as ps
from jaxsim_tpu.ops.batched_engine import BatchedEngine


def main():
    # Smoke mode (set by tests/test_examples.py): shrink the workload so
    # the example runs in seconds while exercising the same API surface.
    smoke = os.environ.get("JAXSIM_EXAMPLE_SMOKE", "0") == "1"
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
    n, d, H = eng.n_joints, ps.obs_dim(eng.n_joints), 16

    # Smoke keeps the full 1024-env tile per candidate (sub-8 sublane
    # tiles over a taller batch cannot lower to Mosaic).
    POP, ENVS_PER, STEPS = (4, 1024, 10) if smoke else (8, 1024, 500)
    state = ps.tile_state(eng.init_state(POP * ENVS_PER, key=jax.random.PRNGKey(0)))
    run = jax.jit(
        ps.build_pallas_env_rollout(
            eng,
            STEPS,
            mlp_policy=H,
            per_tile_weights=True,
            # Per-tile populations: one candidate per env tile, so the
            # tile height must be each candidate's share of batch rows.
            tile_sub=ENVS_PER // ps.TILE_LANE,
            episode_length=400,
            healthy_z_range=(0.6, 1.2),
            tau_limit=100.0,
        )
    )

    # Flat parameter vector per candidate: [W1, b1, W2, b2].
    sizes = [H * d, H, n * H, n]
    total = sum(sizes)

    def unflatten(theta):  # (POP, total) -> per-tile weight stacks
        i0, i1, i2, i3 = np.cumsum(sizes)[:-1].tolist() + [total]
        W1 = theta[:, : i0].reshape(-1, H, d)
        b1 = theta[:, i0:i1].reshape(-1, H, 1)
        W2 = theta[:, i1:i2].reshape(-1, n, H)
        b2 = theta[:, i2:i3].reshape(-1, n, 1)
        return W1, b1, W2, b2

    def fitness(theta):
        W1, b1, W2, b2 = unflatten(theta)
        _, rew, _, _ = run(state, W1=W1, b1=b1, W2=W2, b2=b2)
        # Mean reward of each candidate's 1024-env tile.
        return rew.reshape(POP, -1, ps.TILE_LANE).mean(axis=(1, 2))

    key = jax.random.PRNGKey(42)
    mu = 0.1 * jax.random.normal(key, (total,))
    sigma, lr = 0.05, 0.03

    for gen in range(1 if smoke else 10):
        key, k = jax.random.split(key)
        eps = jax.random.normal(k, (POP // 2, total))
        eps = jnp.concatenate([eps, -eps])  # antithetic sampling
        f = fitness(mu[None] + sigma * eps)
        adv = (f - f.mean()) / (f.std() + 1e-8)
        mu = mu + lr / (POP * sigma) * (adv[:, None] * eps).sum(0)
        print(f"gen {gen:2d}: mean fitness {float(f.mean()):+.3f} "
              f"best {float(f.max()):+.3f}")

    print("done — final mean parameter norm:", float(jnp.linalg.norm(mu)))


if __name__ == "__main__":
    main()
