"""Soft contacts: Hunt/Crossley nonlinear spring-damper with stick/slip.

Role of reference ``src/jaxsim/rbda/contacts/soft.py:24-444``, written fully
batched over contact points (the reference vmaps a scalar-point function; here
one fused expression handles all points — the natural TPU layout).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import safe_norm
from jaxsim_tpu.utils import pytree_dataclass

from . import common


@pytree_dataclass
class SoftContactsParams(common.ContactsParams):
    """Hunt/Crossley parameters (K, D, μ and nonlinearity exponents p, q)."""

    K: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(1e6, dtype=float)
    )
    D: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(2000.0, dtype=float)
    )
    mu: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.5, dtype=float)
    )
    p: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.5, dtype=float)
    )
    q: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(0.5, dtype=float)
    )

    @classmethod
    def build_default_from_jaxsim_model(cls, model, **kwargs):
        """Reference estimation (``contacts/common.py:88-168``) plus a
        stability clamp for the model's time step (see
        :func:`_stability_clamped_defaults`)."""
        params = super(SoftContactsParams, cls).build_default_from_jaxsim_model(
            model, **kwargs
        )
        K, D = _stability_clamped_defaults(
            model, params.K, params.D, kwargs.get("max_penetration", 0.001)
        )
        return params.replace(K=K, D=D)

    @classmethod
    def build(cls, *, K=1e6, D=2000.0, mu=0.5, p=0.5, q=0.5, **kwargs):
        return cls(
            K=jnp.asarray(K, dtype=float),
            D=jnp.asarray(D, dtype=float),
            mu=jnp.asarray(mu, dtype=float),
            p=jnp.asarray(p, dtype=float),
            q=jnp.asarray(q, dtype=float),
        )

    def valid(self) -> jtp.Bool:
        return jnp.all(
            jnp.stack(
                [self.K >= 0, self.D >= 0, self.mu >= 0, self.p >= 0, self.q >= 0]
            )
        )


def hunt_crossley_contact_model(
    position: jtp.VectorLike,
    velocity: jtp.VectorLike,
    tangential_deformation: jtp.VectorLike,
    terrain,
    K: jtp.FloatLike,
    D: jtp.FloatLike,
    mu: jtp.FloatLike,
    p: jtp.FloatLike = 0.5,
    q: jtp.FloatLike = 0.5,
) -> tuple[jtp.Vector, jtp.Vector]:
    """Batched Hunt/Crossley force + material-deformation rate.

    Args:
        position/velocity/tangential_deformation: ``(..., 3)``.

    Returns:
        ``(CW_fl (..., 3) mixed-frame linear force, ṁ (..., 3))``.
    """
    W_p_C = jnp.asarray(position, dtype=float)
    W_pd_C = jnp.asarray(velocity, dtype=float)
    m = jnp.asarray(tangential_deformation, dtype=float)

    delta, delta_dot, n = common.compute_penetration_data(W_p_C, W_pd_C, terrain)

    eps = jnp.finfo(W_p_C.dtype).eps
    # ε-shift keeps fractional powers AD-safe at δ = 0.
    delta_p = jnp.power(delta + eps, p)
    delta_q = jnp.power(delta + eps, q)

    # Normal force (clamped to non-negative).
    force_normal_mag = jnp.maximum(0.0, (K * delta_p) * delta + (D * delta_q) * delta_dot)
    f_normal = force_normal_mag[..., None] * n

    # Tangential terms.
    v_n = jnp.einsum("...i,...i->...", W_pd_C, n)[..., None] * n
    v_tangential = W_pd_C - v_n
    m_n = jnp.einsum("...i,...i->...", m, n)[..., None] * n
    m_tangential = m - m_n

    f_tangential = -(
        (K * delta_p)[..., None] * m_tangential
        + (D * delta_q)[..., None] * v_tangential
    )

    # Stick/slip detection (no-contact counts as sticking).
    f_tan_sq = jnp.einsum("...i,...i->...", f_tangential, f_tangential)
    sticking = jnp.logical_or(delta <= 0, f_tan_sq <= (mu * force_normal_mag) ** 2)

    norm = safe_norm(f_tangential, axis=-1)
    direction = f_tangential / (norm + eps * (norm == 0))[..., None]

    f_tangential = jnp.where(
        sticking[..., None],
        f_tangential,
        jnp.minimum(mu * force_normal_mag, norm)[..., None] * direction,
    )
    f_tangential = jnp.where((delta <= 0)[..., None], 0.0, f_tangential)

    # Material deformation rate, by contact status:
    # slipping (0) / sticking (1) / no contact (2).
    md_no_contact = -(K / D) * m
    md_sticking = v_tangential - (K / D) * m_n
    md_slipping = -(f_tangential + (K * delta_p)[..., None] * m_tangential) / (
        (D * delta_q)[..., None]
    )

    status = sticking.astype(int) + (delta <= 0).astype(int)
    md = jnp.where(
        (status == 0)[..., None],
        md_slipping,
        jnp.where((status == 1)[..., None], md_sticking, md_no_contact),
    )

    return f_normal + f_tangential, md


@dataclasses.dataclass(frozen=True)
class SoftContacts(common.ContactModel):
    """The default contact model (reference ``contacts/soft.py``)."""

    @property
    def _parameters_class(self) -> type[SoftContactsParams]:
        return SoftContactsParams

    def compute_contact_forces(self, model, data):
        from jaxsim_tpu import ops

        idx = model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points

        W_p_C, W_pd_C = ops.collidable_points_pos_vel(
            model.kin_dyn_parameters,
            link_transforms=data._link_transforms,
            link_velocities_inertial=data._link_velocities,
        )

        m_state = data.contact_state.get(
            "tangential_deformation", jnp.zeros_like(W_p_C)
        )
        m_enabled = m_state[jnp.array(idx, dtype=int)] if len(idx) else m_state

        CW_fl, md_enabled = hunt_crossley_contact_model(
            position=W_p_C,
            velocity=W_pd_C,
            tangential_deformation=m_enabled,
            terrain=model.terrain,
            K=model.contact_params.K,
            D=model.contact_params.D,
            mu=model.contact_params.mu,
            p=model.contact_params.p,
            q=model.contact_params.q,
        )

        # Mixed → inertial 6D force: W_f = [f_l; p × f_l] for a pure linear
        # force applied at the point (torque about the world origin).
        W_f = jnp.concatenate([CW_fl, jnp.cross(W_p_C, CW_fl)], axis=-1)

        md = jnp.zeros_like(m_state)
        if len(idx):
            md = md.at[jnp.array(idx, dtype=int)].set(md_enabled)

        return W_f, {"m_dot": md}

    def contact_state_derivative(self, aux_dict: dict) -> dict:
        if "m_dot" not in aux_dict:
            return {}
        return {"tangential_deformation": aux_dict["m_dot"]}

    def zero_state_variables(self, model) -> dict[str, jtp.Array]:
        n_points = len(model.kin_dyn_parameters.contact_parameters.body)
        if n_points == 0:
            return {}
        return {"tangential_deformation": jnp.zeros((n_points, 3))}


def _stability_clamped_defaults(model, K, D, max_penetration):
    """Clamp K, D so the explicit (semi-implicit Euler) integration of the
    contact dynamics is stable at the model's time step.

    The reference's estimator (``contacts/common.py:88-168``) can produce
    K=1e6/D=1e4 defaults that blow up light links at dt=1e-3 (a humanoid
    foot has ω·dt and c/m·dt beyond the stability region). For every link
    owning enabled collidable points we bound:

        damping:   dt · (D √δ · n_pts) / m  ≤ 0.5
        stiffness: dt · √(1.5 K √δ · n_pts / m) ≤ 0.33
    """
    import numpy as np

    kdp = model.kin_dyn_parameters
    cp = kdp.contact_parameters
    idx = cp.indices_of_enabled_collidable_points
    if len(idx) == 0:
        return K, D

    dt = float(model.time_step)
    masses = np.asarray(kdp.link_parameters.mass)
    parents = np.asarray(cp.body)[idx]
    sqrt_d = float(np.sqrt(max_penetration))

    K_cap, D_cap = np.inf, np.inf
    for link in np.unique(parents):
        n_pts = int(np.sum(parents == link))
        m = float(masses[link])
        if m <= 0:
            continue
        D_cap = min(D_cap, 0.5 * m / (dt * sqrt_d * n_pts))
        K_cap = min(K_cap, (0.33 / dt) ** 2 * m / (1.5 * sqrt_d * n_pts))

    from jaxsim_tpu.utils.tracing import tracing

    if tracing(K) or tracing(D):
        return jnp.minimum(K, K_cap), jnp.minimum(D, D_cap)
    return np.minimum(K, K_cap), np.minimum(D, D_cap)
