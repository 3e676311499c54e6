"""ADMM QP solver unit tests (replaces the reference's qpax dependency)."""

import jax
import jax.numpy as jnp
import numpy as np

from jaxsim_tpu.ops.qp import solve_qp
from tests.conftest import assert_allclose


def test_box_constrained():
    # min ½‖x‖² − (1,2)·x  s.t. x ≤ 0.5  → x = (0.5, 0.5).
    Q = jnp.eye(2)
    q = jnp.array([-1.0, -2.0])
    G = jnp.eye(2)
    h = 0.5 * jnp.ones(2)
    x, _ = solve_qp(Q, q, G, h, iterations=100)
    assert_allclose(x, jnp.array([0.5, 0.5]), atol=1e-3)


def test_inactive_constraints():
    # Unconstrained optimum already feasible.
    Q = jnp.diag(jnp.array([2.0, 4.0]))
    q = jnp.array([-2.0, -4.0])  # optimum (1, 1)
    G = jnp.eye(2)
    h = 10.0 * jnp.ones(2)
    x, _ = solve_qp(Q, q, G, h, iterations=100)
    assert_allclose(x, jnp.array([1.0, 1.0]), atol=1e-3)


def test_friction_pyramid_structure():
    """Contact-like QP: unilateral + pyramid rows force f_z ≥ 0 and
    |f_t| ≤ μ f_z."""
    mu = 0.5
    Q = jnp.eye(3)
    q = jnp.array([-3.0, 0.0, -1.0])  # wants fx=3, fz=1 (violates pyramid)
    G = jnp.array(
        [
            [1.0, 0.0, -mu],
            [0.0, 1.0, -mu],
            [-1.0, 0.0, -mu],
            [0.0, -1.0, -mu],
            [0.0, 0.0, -1.0],
        ]
    )
    h = jnp.zeros(5)
    x, _ = solve_qp(Q, q, G, h, iterations=200)
    fx, fy, fz = (float(v) for v in x)
    assert fz >= -1e-4
    assert fx <= mu * fz + 1e-3


def test_vmap_batch():
    Q = jnp.eye(2)
    G = jnp.eye(2)
    h = 0.5 * jnp.ones(2)
    qs = jnp.stack([jnp.array([-1.0, -2.0]), jnp.array([0.3, 0.1])])
    xs, _ = jax.vmap(lambda q: solve_qp(Q, q, G, h, iterations=100))(qs)
    assert_allclose(xs[0], jnp.array([0.5, 0.5]), atol=1e-3)
    assert_allclose(xs[1], jnp.array([-0.3, -0.1]), atol=1e-3)


def test_gradients():
    Q = jnp.eye(2)
    G = jnp.eye(2)
    h = 10.0 * jnp.ones(2)  # inactive

    def loss(q):
        x, _ = solve_qp(Q, q, G, h, iterations=60)
        return jnp.sum(x**2)

    g = jax.grad(loss)(jnp.array([-1.0, -2.0]))
    # x = -q ⇒ loss = ‖q‖² ⇒ ∂loss/∂q = 2q.
    assert_allclose(g, jnp.array([-2.0, -4.0]), atol=5e-2)
