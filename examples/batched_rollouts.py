"""Example: RL-style batched rollouts with the fast engine, sharded over all
devices, with gradient-based tuning of the PD gains.

Run:  PYTHONPATH=. python examples/batched_rollouts.py
"""

import os

import jax
import jax.numpy as jnp

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.ops.batched_engine import BatchedEngine
from jaxsim_tpu.parallel import make_env_mesh
from jax.sharding import NamedSharding, PartitionSpec as P


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
    eng = BatchedEngine.build(model)

    B = 128 if smoke else 1024
    state = eng.init_state(B, key=jax.random.PRNGKey(0))

    # Shard the trailing env axis over all devices (data parallelism).
    if len(jax.devices()) > 1:
        mesh = make_env_mesh()
        state = jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*([None] * (a.ndim - 1) + ["env"])))
            ),
            state,
        )

    # 1000-step on-device rollout.
    out = jax.jit(lambda st: eng.rollout(st, 5 if smoke else 1000))(state)
    print("mean final height:", float(out.p[2].mean()))

    # Differentiable physics: tune the PD gain to keep the base high.
    def objective(log_kp):
        kp = jnp.exp(log_kp)
        o = eng.rollout(state, 3 if smoke else 200, policy=lambda s: -kp * s.s - 0.5 * s.sd)
        return -jnp.mean(o.p[2])

    grad_fn = jax.jit(jax.grad(objective))
    log_kp = jnp.log(jnp.array(30.0))
    for i in range(1 if smoke else 5):
        g = grad_fn(log_kp)
        log_kp = log_kp - 0.1 * g
        print(f"iter {i}: kp = {float(jnp.exp(log_kp)):.2f}")


if __name__ == "__main__":
    main()
