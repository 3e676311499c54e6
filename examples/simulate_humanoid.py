"""Example: simulate the 23-DoF humanoid and record a video.

Run:  PYTHONPATH=. MUJOCO_GL=egl python examples/simulate_humanoid.py
"""

import os

import jax
import jax.numpy as jnp

import jaxsim_tpu.api as js
from jaxsim_tpu import models


def main():
    # Smoke mode (set by tests/test_examples.py): shrink the workload so
    # the example runs in seconds while exercising the same API surface.
    smoke = os.environ.get("JAXSIM_EXAMPLE_SMOKE", "0") == "1"
    # Build the model (URDF string from the built-in zoo — any URDF/SDF path
    # works the same way).
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

    data = js.JaxSimModelData.build(model, base_position=jnp.array([0.0, 0.0, 0.9]))

    @jax.jit
    def step(model, data):
        tau = -60.0 * data.joint_positions - 0.5 * data.joint_velocities
        return js.model.step(model, data, joint_force_references=tau)

    trajectory = []
    for i in range(10 if smoke else 2000):
        data = step(model, data)
        if i % 33 == 0:
            trajectory.append(data)
    print("final base height:", float(data.base_position[2]))

    # Optional: record a video via the MuJoCo interop layer.
    try:
        import mujoco

        from jaxsim_tpu.mujoco import (
            ModelToMjcf,
            MujocoVideoRecorder,
            mujoco_data_from_jaxsim,
        )

        mjcf = ModelToMjcf.convert(build())
        mj_model = mujoco.MjModel.from_xml_string(mjcf)
        recorder = MujocoVideoRecorder(mj_model, mujoco.MjData(mj_model))
        for snap in trajectory:
            recorder.data = mujoco_data_from_jaxsim(mj_model, model, snap, recorder.data)
            recorder.record_frame()
        recorder.write_video("humanoid.mp4")
        print("wrote humanoid.mp4")
    except Exception as e:  # noqa: BLE001 — rendering is optional
        print(f"(video skipped: {e})")


if __name__ == "__main__":
    main()
