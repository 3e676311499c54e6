"""jaxsim-tpu as a multibody dynamics library.

Mirrors the reference tutorial ``examples/jaxsim_as_multibody_dynamics_library
.ipynb``: using the framework not as a simulator but as a differentiable
rigid-body dynamics library — kinematics, forward/inverse dynamics, centroidal
quantities, and contact frames, on a fixed-base manipulator.

Run:  PYTHONPATH=. python examples/multibody_dynamics.py
"""

import jax
import jax.numpy as jnp

import jaxsim_tpu.api as js
from jaxsim_tpu import models


def main():
    # --- Robot model: a 6-DoF fixed-base arm from the built-in zoo. Any
    # URDF/SDF path or string works the same way.
    full_model = js.JaxSimModel.build_from_model_description(
        models.build_arm_urdf(num_joints=6)
    )
    print("model:", full_model.name(), "dofs:", full_model.dofs())

    # --- Considered joints: work with a reduced model that locks some joints
    # at given positions (lumping their links' inertia into the parents).
    model = js.model.reduce(
        model=full_model,
        considered_joints=tuple(full_model.joint_names()[:4]),
        locked_joint_positions={full_model.joint_names()[4]: 0.3},
    )
    print("reduced dofs:", model.dofs(), "links:", model.number_of_links())

    data = js.JaxSimModelData.build(
        model,
        joint_positions=jnp.array([0.3, -0.6, 0.5, 0.2]),
        joint_velocities=jnp.array([0.1, 0.0, -0.2, 0.0]),
    )

    # --- Kinematics: world poses of all links, per-link Jacobians.
    W_H_L = js.model.forward_kinematics(model, data)
    ee_idx = model.number_of_links() - 1
    print("end-effector position:", W_H_L[ee_idx][0:3, 3])

    J_ee = js.link.jacobian(model, data, link_index=ee_idx)
    v_ee = js.link.velocity(model, data, link_index=ee_idx)
    assert jnp.allclose(J_ee @ data.generalized_velocity, v_ee, atol=1e-5)

    # --- Forward dynamics: ABA (O(n)) and CRB (M⁻¹(τ - h)) agree.
    tau = jnp.array([1.0, -2.0, 0.5, 0.1])
    a_aba = js.model.forward_dynamics_aba(model, data, joint_forces=tau)[1]
    a_crb = js.model.forward_dynamics_crb(model, data, joint_forces=tau)[1]
    assert jnp.allclose(a_aba, a_crb, atol=1e-4)
    print("joint accelerations:", a_aba)

    # --- Inverse dynamics: RNEA inverts forward dynamics exactly.
    _, tau_id = js.model.inverse_dynamics(model, data, joint_accelerations=a_aba)
    assert jnp.allclose(tau_id, tau, atol=1e-4)

    # Gravity compensation torques come from RNEA on zeroed velocities:
    g = js.model.free_floating_gravity_forces(model, data)
    print("gravity compensation torques:", g[6:])

    # --- Centroidal dynamics.
    p_com = js.com.com_position(model, data)
    h_G = js.com.centroidal_momentum(model, data)
    J_G = js.com.centroidal_momentum_jacobian(model, data)
    assert jnp.allclose(J_G @ data.generalized_velocity, h_G, atol=1e-5)
    print("CoM:", p_com, "centroidal momentum:", h_G)

    # --- Everything is differentiable: e.g. manipulator gravity torque
    # sensitivity to the joint configuration.
    dg_ds = jax.jacfwd(
        lambda s: js.model.free_floating_gravity_forces(
            model, data.replace(model=model, joint_positions=s)
        )[6:]
    )(data.joint_positions)
    print("∂g/∂s shape:", dg_ds.shape)

    # --- Contact frames: collidable point kinematics on a floating-base model.
    box = js.JaxSimModel.build_from_model_description(models.build_box_urdf())
    box_data = js.JaxSimModelData.build(box, base_position=jnp.array([0.0, 0.0, 1.0]))
    W_p_C, W_v_C = js.contact.collidable_point_kinematics(box, box_data)
    print("contact points:", W_p_C.shape, "lowest:", float(W_p_C[:, 2].min()))

    print("OK")


if __name__ == "__main__":
    main()
