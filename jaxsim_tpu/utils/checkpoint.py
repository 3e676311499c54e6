"""Checkpoint / resume for long rollouts.

The reference has no built-in checkpointing (SURVEY.md §5 — users rely on
generic pytree serialization). This framework ships explicit checkpointing of
any simulation/training pytree (``JaxSimModelData``, ``BatchedState``, RL
train states): leaves are stored in a single ``.npz`` keyed by flattened
index, restored into the structure of a target pytree. This handles
zero-size leaves and custom pytree dataclasses that break orbax/flax
serializers.
"""

from __future__ import annotations

import pathlib

import jax
import numpy as np

import jaxsim_tpu.typing as jtp


def save_checkpoint(path: str | pathlib.Path, pytree: jtp.PyTree) -> None:
    """Save any pytree's leaves to ``<path>.npz``."""
    path = pathlib.Path(str(path) + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree.leaves(pytree)
    np.savez(
        path, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    )


def load_checkpoint(path: str | pathlib.Path, target: jtp.PyTree) -> jtp.PyTree:
    """Load a checkpoint into the structure (treedef) of ``target``."""
    path = pathlib.Path(str(path) + ".npz")
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree.structure(target)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves, target expects"
            f" {treedef.num_leaves}"
        )
    import jax.numpy as jnp

    return jax.tree.unflatten(treedef, [jnp.asarray(leaf) for leaf in leaves])
