"""Relaxed-rigid contacts (MJX-style soft-constraint model).

Role of reference ``src/jaxsim/rbda/contacts/relaxed_rigid.py``: impedance
ξ(pos) sigmoid, reference acceleration a_ref = −(D v + K ξ p), regularization
R from μ and link inertia, then an unconstrained least-squares
``min ‖Ax + b‖²`` with A = G + diag(r).

TPU-first deviation: the reference minimizes with L-BFGS inside a
``lax.while_loop`` wrapped in ``custom_linear_solve``
(``relaxed_rigid.py:399-506``) — batch-hostile on TPU. A is symmetric
positive definite (Delassus + positive diagonal regularization), so the
minimizer is the linear solve x = −A⁻¹b — but NOT via an exact dense
factorization: with near-duplicate collision points (meshes put several
points on one rigid face) the Delassus matrix has near-null directions
whose regularization floor is only ``reg ≈ 1e-6`` (the μ²-scaled impedance
term vanishes at the default μ), and inverting them exactly produces
enormous equal-and-opposite point forces whose f32 cancellation error
destabilizes touchdowns (observed: quadruped dropped on Fourier terrain,
forces O(1e6), blowup in ~30 steps). A FIXED-ITERATION Jacobi-preconditioned
CG — the same solver family as the reference's bounded L-BFGS and our
batched engine's in-kernel PCG — leaves those directions at their
warm-start value (implicit regularization) while converging the physical
ones. Wrapped in ``lax.custom_linear_solve`` so reverse-mode AD gets the
implicit-function gradient (one more bounded PCG on the same SPD operator),
not differentiation through the iterations.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.utils import pytree_dataclass

from . import common


@pytree_dataclass
class RelaxedRigidContactsParams(common.ContactsParams):
    """Impedance/regularization parameters (reference
    ``relaxed_rigid.py:31-183``)."""

    time_constant: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.02, dtype=float)
    )
    damping_coefficient: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(1.0, dtype=float)
    )
    d_min: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.9, dtype=float)
    )
    d_max: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.95, dtype=float)
    )
    width: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.001, dtype=float)
    )
    midpoint: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.5, dtype=float)
    )
    power: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(2.0, dtype=float)
    )
    K: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.0, dtype=float)
    )
    D: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.0, dtype=float)
    )
    mu: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.005, dtype=float)
    )

    @classmethod
    def build(cls, **kwargs):
        fields = {}
        for f in dataclasses.fields(cls):
            if f.name in kwargs and kwargs[f.name] is not None:
                fields[f.name] = jnp.asarray(kwargs[f.name], dtype=float)
        return cls(**fields)

    @classmethod
    def build_default_from_jaxsim_model(cls, model, **kwargs):
        known = {f.name for f in dataclasses.fields(cls)}
        return cls.build(**{k: v for k, v in kwargs.items() if k in known})

    def valid(self) -> jtp.Bool:
        return jnp.all(
            jnp.stack(
                [
                    self.time_constant >= 0,
                    self.damping_coefficient > 0,
                    self.d_min >= 0,
                    self.d_max <= 1.0,
                    self.d_min <= self.d_max,
                    self.width >= 0,
                    self.midpoint >= 0,
                    self.power >= 0,
                    self.mu >= 0,
                ]
            )
        )


@dataclasses.dataclass(frozen=True)
class RelaxedRigidContacts(common.ContactModel):
    """Relaxed-rigid contact model."""

    regularization: float = 1e-6

    @property
    def _parameters_class(self) -> type[RelaxedRigidContactsParams]:
        return RelaxedRigidContactsParams

    def compute_contact_forces(
        self, model, data, *, link_forces=None, joint_torques=None
    ):
        from jaxsim_tpu.api import contact as js_contact
        from jaxsim_tpu.api import model as js_model
        from jaxsim_tpu.api.common import VelRepr

        link_forces = (
            jnp.asarray(link_forces, dtype=float)
            if link_forces is not None
            else jnp.zeros((model.number_of_links(), 6))
        )
        tau = (
            jnp.asarray(joint_torques, dtype=float)
            if joint_torques is not None
            else jnp.zeros(model.number_of_joints())
        )

        position, velocity = js_contact.collidable_point_kinematics(model, data)
        delta, _, n_hat = common.compute_penetration_data(
            position, velocity, model.terrain
        )

        # Constraint-frame position: −δ n̂ (inside terrain ⇒ negative).
        position_constraint = -delta[:, None] * n_hat

        a_ref, r, K, D = _regularizers(
            model=model,
            position_constraint=position_constraint,
            velocity_constraint=velocity,
            parameters=model.contact_params,
        )

        data_mixed = data.replace(velocity_representation=VelRepr.Mixed)
        BW_nu = data_mixed.generalized_velocity
        M_inv = js_model.free_floating_mass_matrix_inverse(model, data_mixed)

        W_f_L = js_model.other_representation_to_inertial_links(
            model, data, link_forces
        )
        data_inertial = data.replace(velocity_representation=VelRepr.Inertial)
        W_ad_free, sdd_free = js_model.forward_dynamics_aba(
            model, data_inertial, joint_forces=tau, link_forces=W_f_L
        )
        BW_nud_free = jnp.concatenate(
            [
                js_model._inertial_acceleration_to_other(model, data_mixed, W_ad_free),
                sdd_free,
            ]
        )

        active = (delta > 0)[:, None, None]
        Jl = jnp.where(
            active,
            js_contact.jacobian(model, data_mixed, output_vel_repr=VelRepr.Mixed)[
                :, 0:3, :
            ],
            0.0,
        ).reshape(-1, 6 + model.number_of_joints())
        Jdl = jnp.where(
            active,
            js_contact.jacobian_derivative(
                model, data_mixed, output_vel_repr=VelRepr.Mixed
            )[:, 0:3, :],
            0.0,
        ).reshape(-1, 6 + model.number_of_joints())

        G = Jl @ M_inv @ Jl.T
        CW_al_free = Jl @ BW_nud_free + Jdl @ BW_nu

        A = G + jnp.diag(r) + self.regularization * jnp.eye(G.shape[0])
        b = CW_al_free - a_ref

        # Bounded Jacobi-PCG minimizer of ‖Ax + b‖² (see module docstring:
        # the fixed iteration count is deliberate implicit regularization
        # of near-null Delassus directions, matching the batched engine's
        # in-kernel solver budget for rough terrain).
        # A is (3·nC, 3·nC): up to 10 contact points CG gets its full
        # exact-convergence count; larger systems cap at 32 (the bounded
        # budget IS the near-null-direction regularization).
        n_iter = min(A.shape[0], 32)
        diag_A = jnp.diag(A)
        prec = jnp.where(diag_A > 0.0, diag_A, 1.0)

        def pcg(matvec, rhs):
            x0 = rhs / prec
            r0 = rhs - matvec(x0)
            z0 = r0 / prec

            def body(carry, _):
                xk, rk, pk, rz = carry
                Ap = matvec(pk)
                alpha = rz / (pk @ Ap + 1e-20)
                xk = xk + alpha * pk
                rk = rk - alpha * Ap
                zk = rk / prec
                rz_n = rk @ zk
                beta = rz_n / (rz + 1e-20)
                return (xk, rk, zk + beta * pk, rz_n), None

            (xk, _, _, _), _ = jax.lax.scan(
                body, (x0, r0, z0, r0 @ z0), None, length=n_iter
            )
            return xk

        x = jax.lax.custom_linear_solve(
            lambda v: A @ v, -b, solve=pcg, symmetric=True
        )

        CW_fl = x.reshape(-1, 3)
        W_f_C = jnp.concatenate([CW_fl, jnp.cross(position, CW_fl)], axis=-1)
        return W_f_C, {}


def _regularizers(model, position_constraint, velocity_constraint, parameters):
    """Impedance, reference acceleration, and diagonal regularization
    (reference ``relaxed_rigid.py:525-653``), batched over points."""
    p_par = parameters
    Omega, zeta = p_par.time_constant, p_par.damping_coefficient
    xi_min, xi_max = p_par.d_min, p_par.d_max
    width, mid, power = p_par.width, p_par.midpoint, p_par.power
    K_user, D_user, mu = p_par.K, p_par.D, p_par.mu

    idx = model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points
    parents = jnp.array(
        [model.kin_dyn_parameters.contact_parameters.body[i] for i in idx], dtype=int
    )
    M_L = model.kin_dyn_parameters.link_parameters.spatial_inertia()

    pos = jnp.asarray(position_constraint)  # (nC, 3)
    vel = jnp.asarray(velocity_constraint)  # (nC, 3)

    # Impedance sigmoid ξ(|pos|/width).
    imp_x = jnp.abs(pos) / width
    imp_a = (1.0 / jnp.power(mid, power - 1)) * jnp.power(imp_x, power)
    imp_b = 1 - (1.0 / jnp.power(1 - mid, power - 1)) * jnp.power(
        jnp.clip(1 - imp_x, 0.0, None), power
    )
    imp_y = jnp.where(imp_x < mid, imp_a, imp_b)
    xi = jnp.clip(xi_min + imp_y * (xi_max - xi_min), xi_min, xi_max)
    xi = jnp.where(imp_x > 1.0, xi_max, xi)

    # Stiffness/damping from the time constant (or user-provided negatives
    # meaning Baumgarte-style gains — reference semantics).
    K = 1 / (xi_max * Omega * zeta) ** 2
    D = 2 / (xi_max * Omega)
    K = jnp.where(K_user < 0, -K_user / xi_max**2, K)
    D = jnp.where(D_user < 0, -D_user / xi_max, D)

    a_ref = -(D * vel + K * xi * pos)  # (nC, 3)

    # Diagonal regularization from μ and the parent-link mass block
    # (reference formula), PLUS a MuJoCo-style impedance floor
    # (1−ξ)/ξ · diag(M⁻¹): the reference's μ²-scaled term vanishes at the
    # default μ = 0.005, leaving near-null Delassus directions (several
    # collidable points on one rigid face) regularized only by the 1e-6
    # Tikhonov — the solve then trades enormous equal-and-opposite point
    # forces whose step-to-step fluctuation destabilizes deep-penetration
    # touchdowns (measured: quadruped on Fourier terrain, |f| O(1e6),
    # blowup in ~30 steps). MuJoCo itself floors R with (1−d)/d scaling,
    # which is what makes its relaxed solve robust; ξ_max = 0.95 keeps the
    # floor at ~5% compliance. Mirrored exactly in the batched engine
    # (``ops/batched_engine.py`` relaxed_rigid_contact_forces) so the
    # engine-vs-generic equivalence holds.
    Minv_blocks = jnp.linalg.inv(M_L[parents][:, 0:3, 0:3])  # (nC, 3, 3)
    coeff = (2 * mu**2 * (1 - xi) / (xi + 1e-12)) * (1 + mu**2)  # (nC, 3)
    r = jnp.einsum("ci,cij->cj", coeff, Minv_blocks)  # (nC, 3)
    diag_Minv = jnp.diagonal(Minv_blocks, axis1=1, axis2=2)  # (nC, 3)
    r = r + ((1 - xi) / (xi + 1e-12)) * diag_Minv

    # Zero out inactive points.
    is_active = (jnp.einsum("ci,ci->c", pos, pos) > 0).astype(float)[:, None]
    a_ref = (a_ref * is_active).flatten()
    r = (r * is_active).flatten()
    return a_ref, r, K, D
