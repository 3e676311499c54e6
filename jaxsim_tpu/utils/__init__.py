from .pytree import field_is_static, pytree_dataclass, static_field
from .tracing import not_tracing, tracing
from .wrappers import CustomHashedObject, HashedNumpyArray, HashlessObject
