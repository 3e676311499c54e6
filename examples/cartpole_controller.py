"""jaxsim-tpu for developing closed-loop robot controllers.

Mirrors the reference tutorial ``examples/jaxsim_for_robot_controllers.ipynb``:
a cartpole simulated open-loop, then stabilized about the upright equilibrium
with an LQR controller whose linearized model comes from `jax.jacfwd` of the
simulator's own forward dynamics — no hand-derived equations of motion.

Run:  PYTHONPATH=. python examples/cartpole_controller.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.api as js
from jaxsim_tpu import models


def rollout(model, data0, controller, n_steps=3000):
    """jit/scan closed-loop rollout; ``controller(data) -> cart force``."""

    def body(data, _):
        f_cart = controller(data)
        data = js.model.step(
            model, data, joint_force_references=jnp.array([f_cart, 0.0])
        )
        return data, data.joint_positions

    _, traj = jax.lax.scan(body, data0, None, length=n_steps)
    return traj


def main():
    model = js.JaxSimModel.build_from_model_description(models.build_cartpole_urdf())
    print("joints:", model.joint_names())  # (cart linear joint, pole revolute)

    # Start with the pole 0.15 rad off upright.
    data0 = js.JaxSimModelData.build(model, joint_positions=jnp.array([0.0, 0.15]))

    # --- Open loop: no force; the pole falls and oscillates.
    traj_open = jax.jit(lambda d: rollout(model, d, lambda _: 0.0))(data0)
    print("open-loop final pole angle:  %+.3f rad" % traj_open[-1, 1])

    # --- Linearize the simulator around the upright equilibrium. The
    # state-space model (A, B) is the Jacobian of the simulator's own ABA
    # forward dynamics — differentiable physics instead of hand-derived EoM.
    def state_derivative(x, u):
        d = data0.replace(
            model=model, joint_positions=x[0:2], joint_velocities=x[2:4]
        )
        _, sdd = js.model.forward_dynamics_aba(
            model, d, joint_forces=jnp.array([u, 0.0])
        )
        return jnp.concatenate([x[2:4], sdd])

    x_eq = jnp.zeros(4)
    A = np.asarray(jax.jacfwd(state_derivative, argnums=0)(x_eq, 0.0))
    B = np.asarray(jax.jacfwd(state_derivative, argnums=1)(x_eq, 0.0)).reshape(4, 1)

    # --- LQR gains from the continuous-time Riccati equation.
    from scipy.linalg import solve_continuous_are

    Q = np.diag([10.0, 100.0, 1.0, 1.0])
    R = np.array([[0.1]])
    P = solve_continuous_are(A, B, Q, R)
    K = jnp.asarray(np.linalg.solve(R, B.T @ P).ravel())
    print("LQR gains:", np.asarray(K).round(2))

    def lqr_controller(data):
        x = jnp.concatenate([data.joint_positions, data.joint_velocities])
        return -K @ x

    traj_lqr = jax.jit(lambda d: rollout(model, d, lqr_controller))(data0)
    x_final, theta_final = float(traj_lqr[-1, 0]), float(traj_lqr[-1, 1])
    print("LQR final cart pos %+.4f m, pole angle %+.4f rad" % (x_final, theta_final))
    assert abs(theta_final) < 0.02 and abs(x_final) < 0.05

    # --- The closed loop is differentiable end-to-end: refine the gains by
    # gradient descent on the rollout cost (differentiable control synthesis).
    def loss(K_):
        def ctrl(data):
            x = jnp.concatenate([data.joint_positions, data.joint_velocities])
            return -K_ @ x

        traj = rollout(model, data0, ctrl, n_steps=500)
        return jnp.mean(traj[:, 1] ** 2) + 0.1 * jnp.mean(traj[:, 0] ** 2)

    loss_and_grad = jax.jit(jax.value_and_grad(loss))
    l0, g = loss_and_grad(K)
    K_tuned = K - 20.0 * g
    l1, _ = loss_and_grad(K_tuned)
    print("loss before/after one gradient step: %.5f -> %.5f" % (l0, l1))
    assert l1 <= l0

    print("OK")


if __name__ == "__main__":
    main()
