"""Rigid contacts: acceleration-level QP with friction pyramid.

Role of reference ``src/jaxsim/rbda/contacts/rigid.py``, with the ``qpax``
interior-point solver replaced by the fixed-iteration ADMM in
:mod:`jaxsim_tpu.ops.qp` (batch-friendly, while-loop-free — the
TPU-idiomatic choice, SURVEY.md §7.7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.utils import pytree_dataclass, static_field

from . import common


@pytree_dataclass
class RigidContactsParams(common.ContactsParams):
    """μ + Baumgarte stabilization gains (reference ``rigid.py:25-92``)."""

    mu: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.5, dtype=float)
    )
    K: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.0, dtype=float)
    )
    D: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.0, dtype=float)
    )

    @classmethod
    def build(cls, *, mu=0.5, K=0.0, D=0.0, **kwargs):
        return cls(
            mu=jnp.asarray(mu, dtype=float),
            K=jnp.asarray(K, dtype=float),
            D=jnp.asarray(D, dtype=float),
        )

    @classmethod
    def build_default_from_jaxsim_model(
        cls,
        model,
        *,
        static_friction_coefficient=0.5,
        stiffness=None,
        damping=None,
        **kwargs,
    ):
        # For rigid contacts K/D are Baumgarte gains, not terrain stiffness.
        return cls.build(
            mu=static_friction_coefficient,
            K=stiffness if stiffness is not None else 1e3,
            D=damping if damping is not None else 2 * jnp.sqrt(1e3),
        )

    def valid(self) -> jtp.Bool:
        return jnp.all(
            jnp.stack([self.mu >= 0.0, self.K >= 0.0, self.D >= 0.0])
        )


@dataclasses.dataclass(frozen=True)
class RigidContacts(common.ContactModel):
    """Acceleration-level rigid contact model (QP on point forces)."""

    regularization_delassus: float = 1e-6
    qp_iterations: int = 60

    @property
    def _parameters_class(self) -> type[RigidContactsParams]:
        return RigidContactsParams

    def compute_contact_forces(
        self, model, data, *, link_forces=None, joint_torques=None
    ):
        from jaxsim_tpu.api import contact as js_contact
        from jaxsim_tpu.api import model as js_model
        from jaxsim_tpu.api import references as js_references
        from jaxsim_tpu.api.common import VelRepr
        from jaxsim_tpu.ops.qp import solve_qp

        n_points = len(
            model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points
        )

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
        delta, delta_dot, n_hat = common.compute_penetration_data(
            position, velocity, model.terrain
        )
        W_H_C = js_contact.transforms(model, data)

        data_mixed = data.replace(velocity_representation=VelRepr.Mixed)
        BW_nu = data_mixed.generalized_velocity
        M_inv = js_model.free_floating_mass_matrix_inverse(model, data_mixed)
        J_WC = js_contact.jacobian(model, data_mixed, output_vel_repr=VelRepr.Mixed)
        Jd_WC = js_contact.jacobian_derivative(
            model, data_mixed, output_vel_repr=VelRepr.Mixed
        )

        # link_forces arrive in data's representation (inertial when called
        # from ode.system_acceleration).
        W_f_L = js_model.other_representation_to_inertial_links(
            model, data, link_forces
        )
        data_inertial = data.replace(velocity_representation=VelRepr.Inertial)
        W_ad_free, sdd_free = js_model.forward_dynamics_aba(
            model, data_inertial, joint_forces=tau, link_forces=W_f_L
        )
        # Convert the free base acceleration (inertial) to mixed.
        BW_nud_free = jnp.concatenate(
            [
                js_model._inertial_acceleration_to_other(
                    model, data_mixed, W_ad_free
                ),
                sdd_free,
            ]
        )

        # Zero the Jacobian rows of inactive points BEFORE building the QP
        # (reference ``rigid.py:201-208`` does this for the impact
        # projection): with finite ADMM iterations, leaving the free
        # acceleration of flying points in the objective pulls spurious
        # nonzero forces on them (the fz<=0 row only binds at convergence),
        # which act as phantom brakes on the joints.
        inactive = delta <= 0
        mask = jnp.where(inactive[:, None, None], 0.0, 1.0)

        # Free linear acceleration of the points (doubly-mixed = W_p̈_C).
        Jl = (mask * J_WC[:, 0:3, :]).reshape(3 * n_points, -1)
        Jdl = (mask * Jd_WC[:, 0:3, :]).reshape(3 * n_points, -1)
        free_contact_acc = Jl @ BW_nud_free + Jdl @ BW_nu
        baumgarte = jnp.where(
            inactive[:, None],
            jnp.zeros_like(n_hat),
            (model.contact_params.K * delta + model.contact_params.D * delta_dot)[
                :, None
            ]
            * n_hat,
        ).flatten()

        # Delassus matrix + regularization.
        G_delassus = Jl @ M_inv @ Jl.T
        Q = G_delassus + self.regularization_delassus * jnp.eye(3 * n_points)
        q = free_contact_acc - baumgarte

        # Friction pyramid + unilaterality + complementarity rows per point.
        mu = model.contact_params.mu
        G_single = jnp.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [-1.0, 0.0, 0.0],
                [0.0, -1.0, 0.0],
                [0.0, 0.0, -1.0],
                [0.0, 0.0, 0.0],
            ]
        )
        G_blocks = jnp.tile(G_single, (n_points, 1, 1))
        G_blocks = G_blocks.at[:, 0:4, 2].add(-mu)
        G_blocks = G_blocks.at[:, 5, 2].set(inactive.astype(float))
        G = jax.scipy.linalg.block_diag(*G_blocks)
        h = jnp.zeros(6 * n_points)

        x, _ = solve_qp(Q, q, G, h, iterations=self.qp_iterations)
        CW_fl = jnp.where(inactive[:, None], 0.0, x.reshape(-1, 3))

        # Mixed → inertial 6D forces.
        W_p_C = position
        W_f_C = jnp.concatenate([CW_fl, jnp.cross(W_p_C, CW_fl)], axis=-1)
        return W_f_C, {}

    def update_velocity_after_impact(self, model, data):
        """Project velocities so active points have zero linear velocity
        (KKT least-squares, reference ``rigid.py:381-443``)."""
        from jaxsim_tpu.api import contact as js_contact
        from jaxsim_tpu.api import model as js_model
        from jaxsim_tpu.api.common import VelRepr, other_representation_to_inertial

        W_p_C = js_contact.collidable_point_positions(model, data)
        delta, *_ = common.compute_penetration_data(
            W_p_C, jnp.zeros_like(W_p_C), model.terrain
        )
        inactive = delta <= 0

        data_mixed = data.replace(velocity_representation=VelRepr.Mixed)
        J_WC = js_contact.jacobian(model, data_mixed, output_vel_repr=VelRepr.Mixed)
        M = js_model.free_floating_mass_matrix(model, data_mixed)
        BW_nu = data_mixed.generalized_velocity

        Jl = jnp.where(inactive[:, None, None], 0.0, J_WC[:, 0:3, :]).reshape(
            -1, M.shape[0]
        )
        nc = Jl.shape[0]
        A = jnp.block([[M, -Jl.T], [Jl, jnp.zeros((nc, nc))]])
        b = jnp.concatenate([M @ BW_nu, jnp.zeros(nc)])
        sol = jnp.linalg.lstsq(A, b)[0]
        BW_nu_post = sol[: M.shape[0]]

        W_H_BW = data._base_transform.at[0:3, 0:3].set(jnp.eye(3))
        W_v_post = other_representation_to_inertial(
            BW_nu_post[0:6], VelRepr.Mixed, data._base_transform, is_force=False
        )

        return data.replace(
            model=model,
            base_linear_velocity_inertial=W_v_post[0:3],
            base_angular_velocity_inertial=W_v_post[3:6],
            joint_velocities=BW_nu_post[6:],
        )
