"""Hashable wrappers for static pytree fields.

Same roles as the reference's ``src/jaxsim/utils/wrappers.py:16-160``:
``HashlessObject`` lets unhashable objects ride in a static field without ever
triggering recompilation; ``HashedNumpyArray`` makes a numpy array usable as a
static field by hashing its (rounded) contents.
"""

from __future__ import annotations

import dataclasses
from typing import Generic, TypeVar

import numpy as np
import numpy.typing as npt

T = TypeVar("T")


@dataclasses.dataclass
class HashlessObject(Generic[T]):
    """Wrap an object so that it hashes to a constant and equals everything
    of its kind — it never contributes to JIT cache keys."""

    obj: T

    def get(self) -> T:
        return self.obj

    def __hash__(self) -> int:
        return 0

    def __eq__(self, other: object) -> bool:
        return isinstance(other, HashlessObject)


@dataclasses.dataclass
class CustomHashedObject(Generic[T]):
    """Wrap an object with a user-supplied hash function."""

    obj: T
    hash_function: "callable" = hash

    def get(self) -> T:
        return self.obj

    def __hash__(self) -> int:
        return self.hash_function(self.obj)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, CustomHashedObject) and hash(self) == hash(other)


class HashedNumpyArray:
    """A numpy array usable as a static (treedef) field.

    The hash is computed from the array contents rounded to ``precision`` so
    that numerically-identical models built twice share the JIT cache
    (reference behavior: ``src/jaxsim/utils/wrappers.py:77-160``).
    """

    precision: float | None = 1e-9

    def __init__(
        self, array: npt.NDArray | None, precision: float | None = 1e-9
    ) -> None:
        self.array = np.asarray(array) if array is not None else None
        self.precision = precision
        self._hash: int | None = None

    def get(self) -> npt.NDArray:
        return self.array

    def __hash__(self) -> int:
        if self._hash is None:
            if self.array is None:
                self._hash = hash(None)
            else:
                arr = self.array
                if self.precision is not None:
                    arr = np.round(arr / self.precision).astype(np.int64)
                self._hash = hash((arr.shape, arr.tobytes()))
        return self._hash

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, HashedNumpyArray):
            return False
        if self.array is None or other.array is None:
            return self.array is None and other.array is None
        if self.array.shape != other.array.shape:
            return False
        return hash(self) == hash(other)
