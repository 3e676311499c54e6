"""Type aliases used across the framework.

Mirrors the role of the reference's ``src/jaxsim/typing.py:1-39`` (plain JAX
aliases; nothing is enforced at runtime).
"""

from __future__ import annotations

from collections.abc import Hashable
from typing import Any

import jax

# Arrays produced by traced computations.
Array = jax.Array
Vector = Array
Matrix = Array
Int = Array
Bool = Array
Float = Array

# Inputs accepted by public functions (python scalars / numpy / jax).
ArrayLike = jax.typing.ArrayLike | tuple
VectorLike = ArrayLike
MatrixLike = ArrayLike
IntLike = int | Int | jax.typing.ArrayLike
BoolLike = bool | Bool | jax.typing.ArrayLike
FloatLike = float | Float | jax.typing.ArrayLike

PyTree = Any
StaticHashable = Hashable
