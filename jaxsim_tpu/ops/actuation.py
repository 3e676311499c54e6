"""Actuation parameters (reference ``src/jaxsim/rbda/actuation/common.py:10-19``)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.utils import pytree_dataclass, static_field


@pytree_dataclass
class ActuationParams:
    """Torque-speed envelope parameters of the actuation model."""

    torque_max: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(3000.0, dtype=float)
    )
    omega_th: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(30.0, dtype=float)
    )
    omega_max: jtp.Float = dataclasses.field(
        default_factory=lambda: jnp.array(100.0, dtype=float)
    )
    enable_friction: bool = static_field(default=False)
