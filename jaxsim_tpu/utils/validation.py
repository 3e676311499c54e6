"""TPU-compatible numeric validation.

The reference's runtime-exception bridge is force-disabled on TPU
(``src/jaxsim/exceptions.py:24-28``); the TPU-native validation story here is
NaN *sentinels*: cheap on-device reductions users can fold into their rollout
outputs and check on the host at their own cadence (no debug callbacks in the
hot path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import jaxsim_tpu.typing as jtp


def nan_guard(pytree: jtp.PyTree) -> jtp.Bool:
    """Single boolean: any non-finite value anywhere in the pytree."""
    leaves = [
        jnp.any(~jnp.isfinite(x))
        for x in jax.tree.leaves(pytree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.asarray(False)
    return jnp.any(jnp.stack(leaves))


def per_env_nan_mask(data_batch, batch_axis: int = 0) -> jtp.Vector:
    """Per-env boolean mask of envs containing non-finite state (for
    selective resets in RL loops)."""
    def leaf_mask(x):
        if not (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)):
            return None
        axes = tuple(i for i in range(x.ndim) if i != batch_axis)
        return jnp.any(~jnp.isfinite(x), axis=axes)

    masks = [m for m in map(leaf_mask, jax.tree.leaves(data_batch)) if m is not None]
    return jnp.any(jnp.stack(masks), axis=0)


def where_valid(mask: jtp.Vector, valid_tree, fallback_tree, batch_axis: int = 0):
    """Select per-env between two batched pytrees (e.g. reset bad envs)."""
    def sel(a, b):
        shape = [1] * a.ndim
        shape[batch_axis] = -1
        return jnp.where(mask.reshape(shape), b, a)

    return jax.tree.map(sel, valid_tree, fallback_tree)
