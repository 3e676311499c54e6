"""Pytree dataclass machinery.

TPU-native replacement for the reference's ``jax_dataclasses`` +
``JaxsimDataclass`` stack (``src/jaxsim/utils/jaxsim_dataclass.py:21-368``).
Instead of mutability contexts we use frozen dataclasses registered through
``jax.tree_util.register_dataclass`` with explicit static (meta) fields, and a
functional ``.replace()``. Static fields become part of the treedef, so they
must be hashable — use plain tuples/ints/strings (or the wrappers in
``jaxsim_tpu.utils.wrappers``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

_STATIC_KEY = "pytree_static"


def static_field(**kwargs) -> Any:
    """A dataclass field stored in the treedef (compile-time constant)."""
    metadata = dict(kwargs.pop("metadata", None) or {})
    metadata[_STATIC_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field_is_static(f: dataclasses.Field) -> bool:
    return bool(f.metadata.get(_STATIC_KEY, False))


def pytree_dataclass(cls: type[T] | None = None, **dc_kwargs):
    """Class decorator: frozen dataclass registered as a JAX pytree.

    Fields declared with :func:`static_field` are treedef metadata; all other
    fields are child arrays. Equality/hash default to the dataclass-generated
    ones only when the class opts in; by default we use identity semantics so
    arrays never hit ``__eq__`` ambiguity.
    """

    def wrap(c: type[T]) -> type[T]:
        # Check the class itself (not inherited) — subclasses of a pytree
        # dataclass still need their own dataclass processing.
        if "__dataclass_fields__" not in c.__dict__:
            c = dataclasses.dataclass(frozen=True, eq=False, **dc_kwargs)(c)

        fields = dataclasses.fields(c)
        data_fields = [f.name for f in fields if not field_is_static(f)]
        meta_fields = [f.name for f in fields if field_is_static(f)]

        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

        if "replace" not in c.__dict__:

            def replace(self, **updates):
                return dataclasses.replace(self, **updates)

            c.replace = replace  # type: ignore[attr-defined]

        c.__pytree_data_fields__ = tuple(data_fields)  # type: ignore[attr-defined]
        c.__pytree_meta_fields__ = tuple(meta_fields)  # type: ignore[attr-defined]
        return c

    return wrap(cls) if cls is not None else wrap
