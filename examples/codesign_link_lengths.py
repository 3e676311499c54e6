"""Example: gradient-based co-design of link morphology.

Differentiates a simulation rollout w.r.t. per-link scaling factors (link
dimensions + density) and runs a few steps of gradient descent so a 4-link
"garpez" robot settles with its end link as high as possible — the hardware
parametrization workflow of the reference (``api/model.py:2461-2593``,
``examples/jaxsim_for_robot_codesign.ipynb``) on the TPU-native stack.

Run:  PYTHONPATH=. python examples/codesign_link_lengths.py
"""

import os

import jax
import jax.numpy as jnp

import jaxsim_tpu.api as js
from jaxsim_tpu import models
from jaxsim_tpu.api import hw_parameters as hw


def main():
    # Smoke mode (set by tests/test_examples.py): shrink the workload so
    # the example runs in seconds while exercising the same API surface.
    smoke = os.environ.get("JAXSIM_EXAMPLE_SMOKE", "0") == "1"
    model = hw.with_hw_metadata(
        js.JaxSimModel.build_from_model_description(models.build_garpez_urdf())
    )
    n_links = model.number_of_links()
    tip = model.link_names()[-1]

    def tip_height_after_rollout(log_dims):
        # Positive parametrization of the dimension multipliers.
        sf = hw.ScalingFactors(
            dims=jnp.exp(log_dims), density=jnp.ones(n_links)
        )
        m = hw.update_hw_parameters(model, sf)
        data = js.JaxSimModelData.build(m, base_position=jnp.array([0.0, 0.0, 0.35]))

        def body(d, _):
            return js.model.step(m, d), None

        data, _ = jax.lax.scan(body, data, None, length=10 if smoke else 150)
        idx = js.link.name_to_idx(m, link_name=tip)
        return js.link.transform(m, data, link_index=idx)[2, 3]

    value_and_grad = jax.jit(jax.value_and_grad(tip_height_after_rollout))

    # Bound each dimension multiplier to [e^-0.3, e^0.4] ≈ [0.74, 1.49] so
    # the optimized design stays physically sensible.
    log_dims = jnp.zeros((n_links, 3))
    for it in range(1 if smoke else 5):
        h, g = value_and_grad(log_dims)
        log_dims = jnp.clip(log_dims + 0.5 * g, -0.3, 0.4)  # ascend: taller tip
        print(f"iter {it}: tip height after rollout = {float(h):.4f} m,"
              f" |grad| = {float(jnp.linalg.norm(g)):.4f}")

    h_final, _ = value_and_grad(log_dims)
    print(f"final tip height: {float(h_final):.4f} m")
    assert jnp.isfinite(h_final)


if __name__ == "__main__":
    main()
