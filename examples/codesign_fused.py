"""Example: hardware co-design with the FUSED Pallas forward.

Gradient-descend the uniform link-inertia scale of the garpez 4-link robot
so a PD-held rollout settles with minimal joint motion: the forward physics
of every optimization step runs in the fused Pallas kernel, and so does
the BACKWARD sweep: ``build_fused_diff_pallas_rollout(params_grad=True)``
traces the vjp of the engine step inside a second Pallas kernel that also
batch-reduces the model-parameter cotangents in VMEM — the BASELINE
"config 4" co-design gradient workload entirely at kernel speed (~10.6M
env*steps/s reverse-mode on one v5e chip for the humanoid).

Run:  PYTHONPATH=. python examples/codesign_fused.py
"""

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
    model = js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    eng = BatchedEngine.build(model)
    base = eng.params()

    state = ps.tile_state(
        eng.init_state(128 if smoke else 1024, key=jax.random.PRNGKey(0))
    )
    import dataclasses

    state = dataclasses.replace(
        state, s=0.3 * jax.random.normal(jax.random.PRNGKey(1), state.s.shape)
    )

    policy = lambda st: -20.0 * st.s - 0.5 * st.sd
    rollout = ps.build_fused_diff_pallas_rollout(
        eng, 3 if smoke else 50, params_grad=True
    )

    @jax.jit
    @jax.value_and_grad
    def loss(log_scale):
        pr = {**base, "M": base["M"] * jnp.exp(log_scale)}
        out = rollout(state, policy, pr=pr)
        # Settle: small residual joint motion at the horizon.
        return jnp.mean(out.s**2) + 0.1 * jnp.mean(out.sd**2)

    log_scale = jnp.asarray(0.0)
    for it in range(1 if smoke else 20):
        value, grad = loss(log_scale)
        log_scale = log_scale - 0.5 * grad
        print(
            f"iter {it:2d}: loss {float(value):.5f} "
            f"inertia scale {float(jnp.exp(log_scale)):.4f}"
        )

    print("optimal uniform inertia scale:", float(jnp.exp(log_scale)))


if __name__ == "__main__":
    main()
