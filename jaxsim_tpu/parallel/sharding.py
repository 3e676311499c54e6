"""ICI sharding of environment batches.

The reference has no distribution story (SURVEY.md §2.9); the TPU-native
scaling axis for a physics engine is the environment batch: every leaf of a
batched ``JaxSimModelData`` carries a leading env axis which we shard over a
1D device mesh with ``NamedSharding``. No collective is needed inside a step
(per-env state is local); XLA only inserts collectives for user-level
reductions (losses, metrics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(n_devices: int | None = None, axis_name: str = "env") -> Mesh:
    """1D device mesh over which env batches are sharded."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=(axis_name,))


def shard_data_batch(data_batch, mesh: Mesh, axis_name: str = "env"):
    """Place every leaf of a batched pytree with its leading axis sharded
    over ``axis_name`` (replicates scalars/leaves without a batch axis)."""

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, data_batch)


def sharded_fused_rollout(
    engine,
    state,
    *,
    n_steps: int,
    policy=None,
    mesh: Mesh | None = None,
    axis_name: str = "env",
    backend: str = "pallas",
):
    """Multi-chip deployment path for the fused rollout.

    Pallas calls are opaque to the pjit partitioner, so the kernel is wrapped
    in ``shard_map``: each device runs the single-launch in-kernel rollout on
    its local shard of the env batch. There is no cross-device communication
    inside a step (per-env state is local), so scaling over ICI is linear.

    Args:
        engine: The batch-minor engine.
        state: Tiled ``BatchedState`` (leaves shaped ``(lead…, B1, 128)``);
            ``B1`` must split evenly into per-device multiples of 8.
        n_steps: Rollout horizon (inside one kernel launch per device).
        policy: Optional ``BatchedState -> torques`` Mosaic-expressible fn.
        mesh: Device mesh (default: all devices on one ``env`` axis).
        backend: ``"pallas"`` (the fused kernel — production TPU path) or
            ``"engine"`` (the numerically identical XLA engine rollout
            under the SAME shard_map plumbing — runs on CPU meshes; used by
            the driver's multichip dryrun and as a debug path).

    Returns:
        The final tiled ``BatchedState``, sharded like the input.
    """
    from jaxsim_tpu.ops import pallas_step as ps

    shard_map = jax.shard_map

    mesh = mesh if mesh is not None else make_env_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    B1 = state.p.shape[-2]
    if B1 % (n_dev * ps.TILE_SUB) != 0:
        raise ValueError(
            f"batch rows {B1} must split into per-device multiples of"
            f" {ps.TILE_SUB} over {n_dev} devices"
        )

    specs = jax.tree.map(
        lambda a: P(*([None] * (a.ndim - 2) + [axis_name, None])), state
    )
    if backend == "pallas":
        roll = ps.build_pallas_rollout(engine, n_steps, policy)
    elif backend == "engine":
        # The engine is layout-agnostic over trailing batch dims, so it
        # accepts the tiled (B1, 128) state with the kernel's signature.
        roll = lambda s: engine.rollout(s, n_steps, policy=policy)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    # check_vma=False: the VMA checker cannot introspect pallas_call outputs.
    fn = shard_map(
        roll, mesh=mesh, in_specs=(specs,), out_specs=specs, check_vma=False
    )
    return jax.jit(fn)(state)


def sharded_rollout(
    model,
    data_batch,
    *,
    n_steps: int,
    policy_fn=None,
    mesh: Mesh | None = None,
    axis_name: str = "env",
):
    """Roll out a sharded env batch for ``n_steps`` with an on-device
    ``lax.scan`` over time (no host round-trips).

    Args:
        model: The (replicated) model.
        data_batch: Batched data with leading env axis (pre-sharded or not).
        n_steps: Number of steps to advance.
        policy_fn: Optional ``(data) -> joint torques`` callable applied
            per-env (defaults to a PD holding zero positions).
        mesh: Optional mesh; when given, the batch is sharded before running.

    Returns:
        The final batched data.
    """
    import jaxsim_tpu.api as js

    if mesh is not None:
        data_batch = shard_data_batch(data_batch, mesh, axis_name=axis_name)

    policy = policy_fn or (
        lambda d: -60.0 * d.joint_positions - 0.5 * d.joint_velocities
    )

    def step_one(model, data):
        return js.model.step(model, data, joint_force_references=policy(data))

    step_batched = jax.vmap(step_one, in_axes=(None, 0))

    @jax.jit
    def run(model, data0):
        def body(data, _):
            return step_batched(model, data), None

        data_tf, _ = jax.lax.scan(body, data0, None, length=n_steps)
        return data_tf

    return run(model, data_batch)
