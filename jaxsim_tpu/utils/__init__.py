from .pytree import field_is_static, pytree_dataclass, static_field
from .tracing import not_tracing, tracing
from .wrappers import CustomHashedObject, HashedNumpyArray, HashlessObject
from .checkpoint import load_checkpoint, save_checkpoint
from .validation import nan_guard, per_env_nan_mask, where_valid
from .profiling import trace, wall_timer
