"""Common API machinery: velocity representations and conversions.

Role of reference ``src/jaxsim/api/common.py:28-222``.
"""

from __future__ import annotations

import contextlib
import enum
import functools
from collections.abc import Iterator

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.math import Adjoint
from jaxsim_tpu.utils import pytree_dataclass, static_field


def named_scope(fn=None, name: str | None = None):
    """Decorate a function with a ``jax.named_scope`` for profiler traces
    (reference ``api/common.py:28-36``)."""

    def wrap(f):
        scope = name or getattr(f, "__name__", "scope")

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            with jax.named_scope(scope):
                return f(*args, **kwargs)

        return wrapper

    return wrap(fn) if fn is not None else wrap


@enum.unique
class VelRepr(enum.IntEnum):
    """Supported 6D velocity representations."""

    Body = enum.auto()
    Mixed = enum.auto()
    Inertial = enum.auto()


def inertial_to_other_representation(
    array: jtp.ArrayLike,
    other_representation: VelRepr,
    transform: jtp.MatrixLike,
    *,
    is_force: bool,
) -> jtp.Array:
    r"""Convert a 6D quantity from inertial-fixed to ``other_representation``.

    ``transform`` is :math:`{}^W H_O` — the pose of the frame O associated
    with the target representation (for Mixed, its rotation is discarded).
    """
    W_array = jnp.asarray(array)
    W_H_O = jnp.asarray(transform)

    if other_representation is VelRepr.Inertial:
        return W_array

    if other_representation is VelRepr.Mixed:
        W_H_O = W_H_O.at[..., 0:3, 0:3].set(jnp.eye(3))

    if not is_force:
        O_X_W = Adjoint.from_transform(W_H_O, inverse=True)
        return jnp.einsum("...ij,...j->...i", O_X_W, W_array)
    O_Xf_W = jnp.swapaxes(Adjoint.from_transform(W_H_O), -1, -2)
    return jnp.einsum("...ij,...j->...i", O_Xf_W, W_array)


def other_representation_to_inertial(
    array: jtp.ArrayLike,
    other_representation: VelRepr,
    transform: jtp.MatrixLike,
    *,
    is_force: bool,
) -> jtp.Array:
    r"""Convert a 6D quantity from ``other_representation`` to inertial-fixed."""
    O_array = jnp.asarray(array)
    W_H_O = jnp.asarray(transform)

    if other_representation is VelRepr.Inertial:
        return O_array

    if other_representation is VelRepr.Mixed:
        W_H_O = W_H_O.at[..., 0:3, 0:3].set(jnp.eye(3))

    if not is_force:
        W_X_O = Adjoint.from_transform(W_H_O)
        return jnp.einsum("...ij,...j->...i", W_X_O, O_array)
    W_Xf_O = jnp.swapaxes(Adjoint.from_transform(W_H_O, inverse=True), -1, -2)
    return jnp.einsum("...ij,...j->...i", W_Xf_O, O_array)


@pytree_dataclass
class ModelDataWithVelocityRepresentation:
    """Base class carrying a static velocity representation, with a context
    manager to temporarily switch it (functional: yields a NEW object)."""

    velocity_representation: VelRepr = static_field(default=VelRepr.Mixed)

    @contextlib.contextmanager
    def switch_velocity_representation(
        self, velocity_representation: VelRepr
    ) -> Iterator["ModelDataWithVelocityRepresentation"]:
        yield self.replace(velocity_representation=velocity_representation)

    @staticmethod
    def inertial_to_other_representation(
        array, other_representation, transform, *, is_force
    ):
        return inertial_to_other_representation(
            array, other_representation, transform, is_force=is_force
        )

    @staticmethod
    def other_representation_to_inertial(
        array, other_representation, transform, *, is_force
    ):
        return other_representation_to_inertial(
            array, other_representation, transform, is_force=is_force
        )
