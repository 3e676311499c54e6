"""Fixed-iteration batched QP solver (ADMM).

TPU-native replacement for the reference's ``qpax`` dependency
(``rbda/contacts/rigid.py:360``): solves

    min_x ½ xᵀQx + qᵀx   s.t.  Gx ≤ h

with a fixed number of ADMM iterations — no data-dependent while loops, so it
vmaps/shards over environment batches and is reverse-AD-safe (gradients flow
through the unrolled iterations; for converged solutions they match the
implicit-function gradients closely).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp


def solve_qp(
    Q: jtp.Matrix,
    q: jtp.Vector,
    G: jtp.Matrix,
    h: jtp.Vector,
    *,
    iterations: int = 60,
    rho: float = 1.0,
) -> tuple[jtp.Vector, jtp.Vector]:
    """Solve the inequality-constrained QP with over-relaxed ADMM.

    Args:
        Q: ``(n, n)`` PSD cost matrix.
        q: ``(n,)`` linear cost.
        G: ``(m, n)`` inequality matrix.
        h: ``(m,)`` inequality bounds (Gx ≤ h).
        iterations: Fixed iteration count (static).
        rho: ADMM penalty parameter.

    Returns:
        ``(x, z)``: the primal solution and the constrained slack Gz ≤ h.
    """
    n = Q.shape[-1]
    m = G.shape[-2]

    # Scale rho by the cost magnitude for better conditioning.
    q_scale = jnp.maximum(jnp.linalg.norm(Q) / jnp.maximum(n, 1), 1e-8)
    rho_eff = rho * q_scale

    KKT = Q + rho_eff * G.T @ G + 1e-9 * q_scale * jnp.eye(n)
    KKT_cho = jax.scipy.linalg.cho_factor(KKT, lower=True)

    def body(carry, _):
        x, z, u = carry
        rhs = -q + rho_eff * G.T @ (z - u)
        x = jax.scipy.linalg.cho_solve(KKT_cho, rhs)
        Gx = G @ x
        z = jnp.minimum(h, Gx + u)
        u = u + Gx - z
        return (x, z, u), None

    x0 = jnp.zeros(n, dtype=Q.dtype)
    z0 = jnp.zeros(m, dtype=Q.dtype)
    u0 = jnp.zeros(m, dtype=Q.dtype)
    (x, z, _), _ = jax.lax.scan(body, (x0, z0, u0), None, length=iterations)
    return x, z
