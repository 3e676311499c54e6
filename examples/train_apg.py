"""Example: analytic policy gradients (APG / SHAC-style) through the physics.

First-order policy optimization that backpropagates THROUGH the simulator:
``build_fused_diff_pallas_rollout`` runs every forward step as a Pallas
kernel and every backward step as a second Pallas kernel (the engine step's
vjp traced in-kernel), so BPTT over the rollout runs at kernel speed — the
workload PPO-style zeroth-order methods cannot express, and the reason a
differentiable simulator (reference: jaxsim's raison d'être) exists.

A one-hidden-layer tanh MLP is trained to swing the garpez 4-link robot's
joints to a target configuration with short-horizon BPTT (truncated windows
re-started from the running state, as in SHAC): loss is the final-state
distance plus a velocity penalty, differentiated w.r.t. the policy weights
through 30 contact-ful physics steps per window.

Run:  PYTHONPATH=. python examples/train_apg.py
"""

import dataclasses

import os

import jax
import jax.numpy as jnp
import optax

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.ops import pallas_step as ps
from jaxsim_tpu.ops.batched_engine import BatchedEngine

# Smoke mode (set by tests/test_examples.py): shrink the workload so the
# example runs in seconds while exercising the same API surface.
_SMOKE = os.environ.get("JAXSIM_EXAMPLE_SMOKE", "0") == "1"
HORIZON = 3 if _SMOKE else 30  # BPTT window length (SHAC-style truncation)
WINDOWS = 1 if _SMOKE else 20
BATCH = 128 if _SMOKE else 1024
HIDDEN = 32


def main():
    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    n = eng.n_joints

    s_target = jnp.array([0.4, -0.6, 0.3, -0.2])[:n]

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "W1": 0.3 * jax.random.normal(k0, (HIDDEN, 2 * n)),
        "b1": jnp.zeros((HIDDEN,)),
        "W2": 0.05 * jax.random.normal(k1, (n, HIDDEN)),
        "b2": jnp.zeros((n,)),
    }

    def policy(st, p):
        # Joint-space observation, (features, B1, 128) batch tiles.
        obs = jnp.concatenate([st.s - s_target[:, None, None], st.sd])
        h = jnp.tanh(
            jnp.einsum("hf,fab->hab", p["W1"], obs) + p["b1"][:, None, None]
        )
        return 5.0 * jnp.tanh(
            jnp.einsum("nh,hab->nab", p["W2"], h) + p["b2"][:, None, None]
        )

    rollout = ps.build_fused_diff_pallas_rollout(eng, HORIZON)

    @jax.jit
    @jax.value_and_grad
    def loss(p, st):
        out = rollout(st, policy, p)
        err = out.s - s_target[:, None, None]
        return jnp.mean(err**2) + 0.02 * jnp.mean(out.sd**2)

    step_fn = jax.jit(lambda st, p: rollout(st, policy, p))

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    state = ps.tile_state(eng.init_state(BATCH, key=k2))
    state = dataclasses.replace(
        state, s=0.2 * jax.random.normal(jax.random.PRNGKey(3), state.s.shape)
    )

    for w in range(WINDOWS):
        value, grads = loss(params, state)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # SHAC truncation: advance the running state through the window
        # with the UPDATED policy, gradients detached.
        state = jax.lax.stop_gradient(step_fn(state, params))
        print(f"window {w:2d}: loss {float(value):.5f}")

    final_err = float(jnp.mean(jnp.abs(state.s - s_target[:, None, None])))
    print(f"mean |s - s*| after training: {final_err:.4f}")


if __name__ == "__main__":
    main()
