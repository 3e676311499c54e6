"""Auto-resetting batched RL environment over the fast engine.

Beyond the reference (which exposes only the raw physics step and leaves the
environment loop to the user): a brax-style vectorized environment with
termination, truncation, and in-step auto-reset, entirely in the engine's
batch-minor layout so rollouts stay on the TPU hot path.

Everything is ``jit``/``scan``-compatible: no data-dependent Python control
flow; resets are per-env ``where`` selections.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

import functools

from jaxsim_tpu.ops.batched_engine import BatchedEngine, BatchedState
from jaxsim_tpu.utils import pytree_dataclass


def _callable_key(fn):
    """Structural cache key for a callable: ``(code, closure, defaults)``.

    A fresh lambda created by re-executing the same source line gets the
    SAME code object, so training loops that rebuild their policy/reward
    closures each iteration still hit the kernel cache (identity hashing —
    the previous behavior — silently recompiled every call). Falls back to
    the function object itself when the closure isn't hashable.
    """
    if fn is None:
        return None
    try:
        cells = tuple(c.cell_contents for c in (fn.__closure__ or ()))
        hash(cells)
        return (fn.__code__, cells, fn.__defaults__)
    except Exception:  # noqa: BLE001 — unhashable closure / exotic callable
        return fn


_FUSED_EVAL_CACHE: dict = {}


def _build_fused_eval(
    env: "BatchedEnv", n_steps: int, policy, linear: bool, mlp_hidden,
    domain: bool, terr_off: bool = False,
):
    """Cache the built (and jitted) eval-rollout per (env, horizon, policy)
    so repeated fused_eval_rollout calls reuse the compiled kernel. Policy /
    reward / obs callables are keyed structurally (see
    :func:`_callable_key`), so passing a fresh-but-identical lambda per
    call does NOT recompile the kernel."""
    from jaxsim_tpu.ops import pallas_step as ps

    key = (
        env.engine,
        env.episode_length,
        env.healthy_z_range,
        _callable_key(env.reward_fn),
        n_steps,
        _callable_key(policy),
        linear,
        mlp_hidden,
        domain,
        terr_off,
        env.terrain_relative,
    )
    fn = _FUSED_EVAL_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            ps.build_pallas_env_rollout(
                env.engine,
                n_steps,
                policy=policy,
                reward=env.reward_fn,
                episode_length=env.episode_length,
                healthy_z_range=env.healthy_z_range,
                linear_policy=linear,
                mlp_policy=mlp_hidden,
                domain=domain,
                terr_off=terr_off,
                terrain_relative=env.terrain_relative,
            )
        )
        if len(_FUSED_EVAL_CACHE) >= 32:
            _FUSED_EVAL_CACHE.pop(next(iter(_FUSED_EVAL_CACHE)))
        _FUSED_EVAL_CACHE[key] = fn
    return fn


@pytree_dataclass
class EnvState:
    """Per-env simulation state plus episode bookkeeping (trailing batch)."""

    sim: BatchedState
    steps: jnp.ndarray  # (B,) int32 steps since episode start
    key: jnp.ndarray  # PRNG key driving reset noise


@dataclasses.dataclass(frozen=True)
class BatchedEnv:
    """Vectorized environment: ``reset``/``step`` with per-env auto-reset.

    Args:
        engine: The batch-minor physics engine.
        episode_length: Truncation horizon (steps).
        action_scale: Torques are ``action · action_scale``.
        reset_base_position: Episode-start base position.
        reset_noise_std: Std of the Gaussian noise on the reset position.
        healthy_z_range: Episode terminates when base height leaves it.
        terrain_relative: With a FourierTerrain engine, use the
            terrain-RELATIVE base height (p_z − h(x, y)) in the default
            observation and in the healthy-height termination test —
            rough-terrain policies cannot act on absolute height.
        reward_fn: ``(prev_sim, action, new_sim) -> (B,)``; default is an
            upright-height bonus minus a control cost.
        obs_fn: ``sim -> (obs_dim, B)``; default concatenates
            ``[s, sd, q, v, p_z]``.
    """

    engine: BatchedEngine
    episode_length: int = 1000
    action_scale: float = 1.0
    reset_base_position: tuple = (0.0, 0.0, 0.9)
    reset_noise_std: float = 0.01
    healthy_z_range: tuple = (0.4, 2.0)
    terrain_relative: bool = False
    reward_fn: Callable | None = None
    obs_fn: Callable | None = None

    def __post_init__(self):
        if self.terrain_relative and self.engine.terrain_kind != "fourier":
            raise ValueError(
                "terrain_relative requires a FourierTerrain engine"
            )

    def _height_rel(self, sim: BatchedState) -> jnp.ndarray:
        h, _, _ = self.engine._fourier_height_grad(
            self.engine.params(), sim.p[0], sim.p[1]
        )
        return sim.p[2] - h

    @property
    def action_size(self) -> int:
        return self.engine.n_joints

    def _obs(self, sim: BatchedState) -> jnp.ndarray:
        if self.obs_fn is not None:
            return self.obs_fn(sim)
        z = (
            self._height_rel(sim)[None]
            if self.terrain_relative
            else sim.p[2:3]
        )
        return jnp.concatenate([sim.s, sim.sd, sim.q, sim.v, z], axis=0)

    def _reward(self, prev: BatchedState, action, new: BatchedState):
        if self.reward_fn is not None:
            return self.reward_fn(prev, action, new)
        # Height clamped so a diverging env cannot bank an arbitrarily large
        # reward on its final pre-reset transition (matches the fused kernel).
        upright = jnp.minimum(new.p[2], 2.0)
        ctrl_cost = 0.001 * jnp.sum(action * action, axis=0)
        return upright - ctrl_cost

    def _fresh_sim(self, B: int, key) -> BatchedState:
        st = self.engine.init_state(B, base_position=self.reset_base_position)
        noise = self.reset_noise_std * jax.random.normal(key, (3, B))
        return st.replace(p=st.p + noise)

    def reset(self, key, batch_size: int) -> tuple[EnvState, jnp.ndarray]:
        """Start ``batch_size`` episodes; returns ``(state, obs)``."""
        k_noise, k_carry = jax.random.split(key)
        sim = self._fresh_sim(batch_size, k_noise)
        state = EnvState(
            sim=sim,
            steps=jnp.zeros(batch_size, dtype=jnp.int32),
            key=k_carry,
        )
        return state, self._obs(sim)

    def step(
        self, state: EnvState, action: jnp.ndarray
    ) -> tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Advance one control step; envs that end restart in place.

        Returns ``(state, obs, reward, done)`` with ``done`` flagging the
        transition that ENDED the old episode (termination or truncation);
        ``obs`` is the post-auto-reset observation, as in brax/gymnax.
        """
        B = state.steps.shape[0]
        if action.shape != (self.engine.n_joints, B):
            raise ValueError(
                f"action must have shape ({self.engine.n_joints}, {B})"
                f" (n_joints, batch); got {action.shape}"
            )
        tau = self.action_scale * action
        new_sim = self.engine.step(state.sim, tau)
        steps = state.steps + 1

        z = (
            self._height_rel(new_sim)
            if self.terrain_relative
            else new_sim.p[2]
        )
        lo, hi = self.healthy_z_range
        terminated = jnp.logical_or(z < lo, z > hi)
        truncated = steps >= self.episode_length
        done = jnp.logical_or(terminated, truncated)

        reward = self._reward(state.sim, action, new_sim)

        k_noise, k_carry = jax.random.split(state.key)
        fresh = self._fresh_sim(B, k_noise)
        sim = jax.tree.map(
            lambda n, f: jnp.where(done, f, n), new_sim, fresh
        )
        steps = jnp.where(done, 0, steps)

        state = EnvState(sim=sim, steps=steps, key=k_carry)
        return state, self._obs(sim), reward, done

    def fused_eval_rollout(
        self,
        key,
        batch_size: int,
        n_steps: int,
        policy: Callable | None = None,
        W=None,
        b=None,
        mlp_weights: tuple | None = None,
        domain: dict | None = None,
    ):
        """Policy-evaluation rollout fused into ONE Pallas kernel launch:
        step + termination/truncation + auto-reset run entirely in VMEM
        (~55M env·steps/s for the 23-DoF humanoid on one v5e chip, ~1%
        slower than the bare physics rollout).

        Two policy modes:

        - ``policy``: a compile-time closure ``BatchedState -> torques``,
          Mosaic-expressible (elementwise jnp over the state tiles). Changing
          it recompiles the kernel.
        - ``W`` (+ optional ``b``): a linear policy ``tau = W @ obs + b``
          with CALL-TIME weights — evaluating updated weights reuses the
          compiled kernel (~46M env·steps/s for the humanoid). ``W`` has
          shape ``(n_joints, 2·n_joints + 11)`` over the default observation
          ``[s, sd, q, v, p_z]``.
        - ``mlp_weights=(W1, b1, W2, b2)``: a one-hidden-layer tanh MLP
          ``tau = W2 @ tanh(W1 @ obs + b1) + b2`` with CALL-TIME weights
          (``W1 (H, obs_dim)``, ``W2 (n_joints, H)``) — nonlinear policies
          at ~2% overhead over bare physics.

        ``domain``: optional dict of per-env multipliers, each shape
        ``(batch_size,)``, for call-time domain randomization: contact
        ``Kmul``/``Dmul``/``mumul`` plus dynamics ``gmul`` (gravity) and
        ``Mmul`` (uniform link-inertia/density scale). With a
        ``FourierTerrain`` engine, ``terrOff`` of shape ``(2, batch_size)``
        additionally translates each env's terrain query — per-env
        rough-terrain randomization evaluated in-kernel.

        Auto-reset respawns at the episode-start state without reset noise.
        Returns ``(final_sim, reward_sum (B,), resets (B,))``.
        """
        from jaxsim_tpu.ops import pallas_step as ps

        # One 128-env lane row is the hard floor. Above it, Mosaic needs
        # the (clamped) sublane tile to divide the batch rows: either at
        # most one default tile (B1 <= TILE_SUB, clamped to cover the
        # axis) or whole multiples of it.
        B1 = batch_size // ps.TILE_LANE
        if batch_size % ps.TILE_LANE != 0 or not (
            B1 <= ps.TILE_SUB or B1 % ps.TILE_SUB == 0
        ):
            raise ValueError(
                f"batch_size must be a multiple of {ps.TILE_LANE} with"
                f" {ps.TILE_LANE}*B1 rows, B1 <= {ps.TILE_SUB} or divisible"
                f" by {ps.TILE_SUB}; got {batch_size}"
            )
        if sum(x is not None for x in (policy, W, mlp_weights)) > 1:
            raise ValueError(
                "pass exactly one of policy (closure), W/b (linear), or"
                " mlp_weights"
            )
        dkw = {}
        terr_off = False
        if domain is not None:
            bad = set(domain) - {
                "Kmul", "Dmul", "mumul", "gmul", "Mmul", "terrOff"
            }
            if bad:
                raise ValueError(f"unknown domain multipliers: {sorted(bad)}")
            domain = dict(domain)
            off = domain.pop("terrOff", None)
            dkw = {
                k: jnp.asarray(v, dtype=jnp.float32).reshape(-1, ps.TILE_LANE)
                for k, v in domain.items()
            }
            if off is not None:
                # (2, B) per-env terrain translation (FourierTerrain
                # engines): every env gets its own rough-terrain patch.
                terr_off = True
                dkw["terrOff"] = jnp.asarray(
                    off, dtype=jnp.float32
                ).reshape(2, -1, ps.TILE_LANE)
            domain = domain or None
        sim = self._fresh_sim(batch_size, key)
        mlp_hidden = (
            int(jnp.asarray(mlp_weights[0]).shape[0])
            if mlp_weights is not None
            else None
        )
        run = _build_fused_eval(
            self, n_steps, policy, W is not None, mlp_hidden,
            domain is not None, terr_off,
        )
        if W is not None:
            b = b if b is not None else jnp.zeros((self.engine.n_joints, 1))
            final, rew, resets, _ = run(ps.tile_state(sim), W, b, **dkw)
        elif mlp_weights is not None:
            W1, b1, W2, b2 = mlp_weights
            final, rew, resets, _ = run(
                ps.tile_state(sim), W1=W1, b1=b1, W2=W2, b2=b2, **dkw
            )
        else:
            final, rew, resets, _ = run(ps.tile_state(sim), **dkw)
        return (
            ps.untile_state(final),
            rew.reshape(-1),
            resets.reshape(-1),
        )

    def rollout(self, state: EnvState, policy: Callable, n_steps: int):
        """Scan ``n_steps`` of ``action = policy(obs)``; returns the final
        state and stacked ``(obs, reward, done)`` trajectories."""

        def body(st, _):
            obs = self._obs(st.sim)
            st, obs_next, reward, done = self.step(st, policy(obs))
            return st, (obs_next, reward, done)

        return jax.lax.scan(body, state, None, length=n_steps)
