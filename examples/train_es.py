"""Example: evolution-strategies training entirely on-device.

OpenAI-ES tuning the PD gains of a "stay upright" policy for the 23-DoF
humanoid: every generation is ONE fused kernel launch that evaluates the
whole population — each candidate's weights run on their own 1024-env tile
with termination, truncation, and auto-reset handled in-kernel
(~52M env·steps/s), so a generation of 8 candidates x 1024 envs x 300 steps
costs ~160 ms of TPU time (8 candidates x 1024 envs x 1000 steps).

The search space is the per-joint (log) PD gains (46 parameters) embedded
into the diagonal of the linear policy ``tau = W @ obs``; the same machinery
takes a full dense ``W`` for richer policies.

Run:  PYTHONPATH=. python examples/train_es.py
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
    n, d = eng.n_joints, ps.obs_dim(eng.n_joints)

    # population = one candidate per (8, 128) env tile. Smoke keeps the
    # full 1024-env tile per candidate: Mosaic cannot lower sub-8 sublane
    # tiles over a taller batch, so shrinking ENVS_PER below one tile
    # would change the kernel shape class, not just the workload.
    POP, ENVS_PER, STEPS = (4, 1024, 10) if smoke else (8, 1024, 1000)
    state = ps.tile_state(eng.init_state(POP * ENVS_PER, key=jax.random.PRNGKey(0)))
    run = jax.jit(
        ps.build_pallas_env_rollout(
            eng,
            STEPS,
            linear_policy=True,
            per_tile_weights=True,
            # Per-tile populations: one candidate per env tile, so the
            # tile height must be each candidate's share of batch rows.
            tile_sub=ENVS_PER // ps.TILE_LANE,
            episode_length=5 if smoke else 500,
            healthy_z_range=(0.6, 1.2),
            tau_limit=100.0,  # actuator saturation keeps rogue candidates finite
        )
    )
    bias = jnp.zeros((POP, n, 1))

    def gains_to_W(log_gains):  # (POP, 2n) -> (POP, n, d)
        kp, kd = jnp.exp(log_gains[:, :n]), jnp.exp(log_gains[:, n:])
        W = jnp.zeros((log_gains.shape[0], n, d))
        W = W.at[:, jnp.arange(n), jnp.arange(n)].set(-kp)
        W = W.at[:, jnp.arange(n), n + jnp.arange(n)].set(-kd)
        return W

    def fitness(log_gains):
        _, rew, _, _ = run(state, gains_to_W(log_gains), bias)
        return rew.reshape(POP, -1).mean(axis=1) / STEPS

    # Start from weak gains (kp=2, kd=0.02): the humanoid buckles and
    # episodes terminate early; ES strengthens the gains until it stands.
    theta = jnp.concatenate(
        [jnp.full(n, jnp.log(2.0)), jnp.full(n, jnp.log(0.02))]
    )
    sigma, lr = 0.25, 0.5
    key = jax.random.PRNGKey(42)
    base = float(fitness(jnp.tile(theta, (POP, 1)))[0])
    print(f"gen  0: baseline reward/step = {base:.4f}")

    for gen in range(1, 2 if smoke else 31):
        key, k_eps = jax.random.split(key)
        eps = jax.random.normal(k_eps, (POP // 2, 2 * n))
        eps = jnp.concatenate([eps, -eps])  # antithetic pairs
        f = fitness(theta[None] + sigma * eps)
        # Centered ranks: robust to catastrophic candidates.
        ranks = jnp.argsort(jnp.argsort(f)).astype(jnp.float32)
        shaped = ranks / (POP - 1) - 0.5
        theta = theta + lr * jnp.einsum("p,pi->i", shaped, eps) / (POP * sigma)
        if gen % 5 == 0:
            cur = float(fitness(jnp.tile(theta, (POP, 1)))[0])
            print(f"gen {gen:2d}: reward/step = {cur:.4f} "
                  f"(population best {float(f.max()):.4f})")

    final = float(fitness(jnp.tile(theta, (POP, 1)))[0])
    kp = np.exp(np.asarray(theta[:n]))
    print(f"final: reward/step = {final:.4f} (started at {base:.4f})")
    print(f"learned kp range: [{kp.min():.2f}, {kp.max():.2f}]")
    assert np.isfinite(final)
    assert smoke or final > base


if __name__ == "__main__":
    main()
