"""Contact-model interface and shared terrain-penetration math.

Role of reference ``src/jaxsim/rbda/contacts/common.py``. Contact models are
static (hashable) strategy objects stored on the model; their numeric
parameters live in ``model.contact_params`` (a dynamic pytree).
"""

from __future__ import annotations

import abc
import dataclasses

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import STANDARD_GRAVITY
from jaxsim_tpu.terrain import Terrain

MAX_STIFFNESS = 1e6
MAX_DAMPING = 1e4


def compute_penetration_data(
    p: jtp.VectorLike,
    v: jtp.VectorLike,
    terrain: Terrain,
) -> tuple[jtp.Float, jtp.Float, jtp.Vector]:
    """Penetration depth δ, rate δ̇, and terrain normal n̂ for collidable
    points, batched over leading dims (reference ``contacts/common.py:25-63``).

    Args:
        p: ``(..., 3)`` point positions (world).
        v: ``(..., 3)`` mixed linear velocities of the points.
        terrain: The terrain model.
    """
    p = jnp.asarray(p)
    v = jnp.asarray(v)
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]

    n = terrain.normal(px, py)
    h = jnp.stack(
        [jnp.zeros_like(pz), jnp.zeros_like(pz), terrain.height(px, py) - pz],
        axis=-1,
    )
    delta = jnp.maximum(0.0, jnp.einsum("...i,...i->...", h, n))
    delta_dot = -jnp.einsum("...i,...i->...", v, n)
    delta_dot = jnp.where(delta > 0, delta_dot, 0.0)
    return delta, delta_dot, n


class ContactsParams(abc.ABC):
    """Base class of contact-model parameter pytrees."""

    @classmethod
    @abc.abstractmethod
    def build(cls, **kwargs) -> "ContactsParams": ...

    @classmethod
    def build_default_from_jaxsim_model(
        cls,
        model,
        *,
        stiffness: jtp.FloatLike | None = None,
        damping: jtp.FloatLike | None = None,
        standard_gravity: jtp.FloatLike = STANDARD_GRAVITY,
        static_friction_coefficient: jtp.FloatLike = 0.5,
        max_penetration: jtp.FloatLike = 0.001,
        number_of_active_collidable_points_steady_state: jtp.IntLike = 1,
        damping_ratio: jtp.FloatLike = 1.0,
        p: jtp.FloatLike = 0.5,
        q: jtp.FloatLike = 0.5,
        **kwargs,
    ) -> "ContactsParams":
        """Estimate K, D from the model mass and the desired steady-state
        penetration δ_max (reference ``contacts/common.py:88-168``).

        Runs as eager NumPy when nothing is traced (the model-build path —
        avoids per-op XLA compiles); falls back to jnp under tracing.
        """
        import numpy as _np

        from jaxsim_tpu.utils.tracing import tracing

        mass_leaf = model.kin_dyn_parameters.link_parameters.mass
        # Every FloatLike input may be a tracer (e.g. differentiating the
        # param estimation w.r.t. max_penetration): np ops on a tracer raise.
        eager = not any(
            map(
                tracing,
                (
                    mass_leaf,
                    stiffness,
                    damping,
                    max_penetration,
                    damping_ratio,
                    standard_gravity,
                    number_of_active_collidable_points_steady_state,
                    p,
                    q,
                ),
            )
        )
        xp = _np if eager else jnp
        m = xp.sum(xp.asarray(mass_leaf))

        if stiffness is None:
            f_average = (
                m * standard_gravity / number_of_active_collidable_points_steady_state
            )
            stiffness = f_average / xp.power(max_penetration, 1 + p)
            stiffness = xp.clip(stiffness, 0, MAX_STIFFNESS)

        if damping is None:
            critical_damping = 2 * xp.sqrt(stiffness * m)
            damping = xp.clip(damping_ratio * critical_damping, 0, MAX_DAMPING)

        return cls.build(
            K=stiffness,
            D=damping,
            mu=static_friction_coefficient,
            p=p,
            q=q,
            **kwargs,
        )


@dataclasses.dataclass(frozen=True)
class ContactModel(abc.ABC):
    """Base class of contact models (static strategy objects).

    Subclasses must be hashable frozen dataclasses: they are static fields of
    :class:`~jaxsim_tpu.api.model.JaxSimModel` and participate in JIT keys.
    """

    @abc.abstractmethod
    def compute_contact_forces(
        self, model, data
    ) -> tuple[jtp.Matrix, dict[str, jtp.PyTree]]:
        """Return ``(W_f per enabled point (nC, 6), aux dict)``."""

    def contact_state_derivative(self, aux_dict: dict) -> dict:
        """Map the aux dict of ``compute_contact_forces`` to a derivative
        pytree with the same structure as the contact state."""
        return {}

    def update_contact_state(self, old_contact_state, aux_dict, dt) -> dict:
        """Explicit-Euler integrate the contact state after a step."""
        import jax

        return jax.tree.map(
            lambda x, xd: x + dt * xd,
            old_contact_state,
            self.contact_state_derivative(aux_dict),
        )

    def update_velocity_after_impact(self, model, data):
        """Optionally project velocities after impacts (rigid contacts)."""
        return data

    def zero_state_variables(self, model) -> dict[str, jtp.Array]:
        """Initial contact-state pytree for this model."""
        return {}

    @property
    def _parameters_class(self) -> type[ContactsParams]:
        raise NotImplementedError
