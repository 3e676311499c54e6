"""Fused Pallas step kernel — the whole simulation step in VMEM.

North-star design (BASELINE.json): FK + soft contacts + the 3-pass ABA +
semi-implicit Euler fused into a single on-chip kernel so an env-batch tile
advances without HBM round-trips between stages. The kernel body reuses the
batch-minor engine's math (:mod:`jaxsim_tpu.ops.batched_engine`) — plain jnp
expressions over ``(8, 128)``-shaped batch tiles, each mapping to one VPU
register — with the grid iterating over batch tiles.

Gradient workloads have two tiers: :func:`build_fused_diff_pallas_step` /
``_rollout`` run BOTH the forward and the transposed backward sweep as
Pallas kernels (the vjp of the engine step is traced inside the kernel
body; optional in-kernel batch-reduced model-parameter cotangents for
co-design), while :func:`build_diff_pallas_step` / ``_rollout`` keep the
numerically identical XLA engine as the backward (checkpointed chunks for
long horizons).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .batched_engine import BatchedEngine, BatchedState, set_mosaic_mode

# Batch tile: 8 sublanes × 128 lanes = 1024 envs per grid step.
TILE_SUB = 8
TILE_LANE = 128
TILE_ENVS = TILE_SUB * TILE_LANE

# The RK4 step keeps four derivative stages live in VMEM and overflows the
# default 16 MiB scoped-vmem limit for the humanoid; v5e has 128 MiB VMEM,
# so raise the cap (the compiler only uses what the kernel needs).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)



def _effective_tile(tile_sub: int, B1: int) -> int:
    """Clamp the requested sublane tile height to the actual batch rows.

    Small batches (example smoke runs, B=128..512 -> B1 < TILE_SUB) run as
    one short tile instead of tripping the divisibility assert; full-scale
    batches keep the caller's tile. Mosaic requires the second-minor block
    dim to be divisible by 8 OR equal to the array dim, so a sub-8 tile is
    only legal when it covers the whole batch axis (verified on silicon:
    (1, 128) blocks over a (4, 128) batch fail to lower)."""
    ts = min(int(tile_sub), int(B1))
    if B1 % ts != 0:
        raise ValueError(f"batch rows {B1} not a multiple of tile {ts}")
    if ts % 8 != 0 and ts != B1:
        raise ValueError(
            f"sublane tile {ts} over {B1} batch rows cannot lower to"
            f" Mosaic (block second-minor must be divisible by 8 or cover"
            f" the axis); use tile_sub divisible by 8, or one tile per"
            f" batch (tile_sub >= B1)"
        )
    return ts

def engine_param_order(engine: BatchedEngine) -> tuple[str, ...]:
    """Names of the engine's numeric model arrays, in kernel-input order
    (relaxed-rigid engines carry the extra per-point inverse-mass blocks)."""
    if engine.terrain_kind == "heightmap":
        raise ValueError(
            "heightmap terrain is XLA-engine only (its per-lane grid"
            " gathers don't lower to Mosaic): use engine.rollout(), or"
            " FourierTerrain for the fused kernels"
        )
    base = ("S", "M", "axis", "lamH", "sucH", "cpoint")
    if engine.contact_model == "relaxed_rigid":
        base = base + ("rrMinv",)
    if engine._rr_Kc:
        # Nominal per-point Delassus blocks: block-Jacobi PCG
        # preconditioner payload (rough-terrain relaxed-rigid engines).
        base = base + ("rrKc",)
    if engine.constraint_parents:
        base = base + ("cH1", "cH2")
    if engine.terrain_kind == "fourier":
        base = base + ("terr",)
    return base


def _step_kernel(engine: BatchedEngine, policy, *refs):
    order = engine_param_order(engine)
    (s_ref, sd_ref, p_ref, q_ref, v_ref, m_ref) = refs[:6]
    pr = {k: refs[6 + i][:] for i, k in enumerate(order)}
    (s_out, sd_out, p_out, q_out, v_out, m_out) = refs[6 + len(order):]
    state = BatchedState(
        s=s_ref[:],
        sd=sd_ref[:],
        p=p_ref[:],
        q=q_ref[:],
        v=v_ref[:],
        m=m_ref[:],
    )
    tau = policy(state)
    set_mosaic_mode(True)
    try:
        new = engine.step(state, tau, pr)
    finally:
        set_mosaic_mode(False)
    s_out[:] = new.s
    sd_out[:] = new.sd
    p_out[:] = new.p
    q_out[:] = new.q
    v_out[:] = new.v
    m_out[:] = new.m


def build_pallas_step(engine: BatchedEngine, policy=None, tile_sub: int | None = None):
    """Return a jittable ``state -> state`` where every leaf has batch shape
    ``(B1, 128)`` with ``B1`` a multiple of ``tile_sub`` (B = B1 · 128 envs).

    ``tile_sub`` is the sublane height of the env tile (default
    ``TILE_SUB``); larger tiles amortize per-tile overhead at the cost of
    VMEM — (32, 128) is ~25% faster than (8, 128) for the SIE humanoid."""
    policy = policy or (lambda st: -60.0 * st.s - 0.5 * st.sd)
    n, nC = engine.n_joints, engine.m_rows
    tile_sub = TILE_SUB if tile_sub is None else int(tile_sub)

    kernel = functools.partial(_step_kernel, engine, policy)

    def step(state: BatchedState) -> BatchedState:
        B1 = state.p.shape[-2]
        ts = _effective_tile(tile_sub, B1)
        grid = (B1 // ts,)

        def spec(lead: tuple[int, ...]):
            nlead = len(lead)
            return pl.BlockSpec(
                lead + (ts, TILE_LANE),
                (lambda i, _n=nlead: (0,) * _n + (i, 0)),
                memory_space=pltpu.VMEM,
            )

        state_specs = [
            spec((n,)),  # s
            spec((n,)),  # sd
            spec((3,)),  # p
            spec((4,)),  # q
            spec((6,)),  # v
            spec((nC, 3)),  # m
        ]
        pr = engine.params()

        def full_spec(a):
            nd = a.ndim
            return pl.BlockSpec(
                a.shape, (lambda i, _n=nd: (0,) * _n), memory_space=pltpu.VMEM
            )

        param_order = engine_param_order(engine)
        param_specs = [full_spec(pr[k]) for k in param_order]
        out_shapes = [
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (state.s, state.sd, state.p, state.q, state.v, state.m)
        ]

        s, sd, p, q, v, m = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=state_specs + param_specs,
            out_specs=tuple(state_specs),
            out_shape=tuple(out_shapes),
            compiler_params=_COMPILER_PARAMS,
        )(
            state.s, state.sd, state.p, state.q, state.v, state.m,
            *[pr[k] for k in param_order],
        )
        return BatchedState(s=s, sd=sd, p=p, q=q, v=v, m=m)

    return step


def _step_tau_kernel(engine: BatchedEngine, *refs):
    """Fused step with the torques as a kernel INPUT tile (no policy
    closure) — the forward primitive of the differentiable Pallas step."""
    order = engine_param_order(engine)
    (s_ref, sd_ref, p_ref, q_ref, v_ref, m_ref, tau_ref) = refs[:7]
    pr = {k: refs[7 + i][:] for i, k in enumerate(order)}
    (s_out, sd_out, p_out, q_out, v_out, m_out) = refs[7 + len(order):]
    state = BatchedState(
        s=s_ref[:], sd=sd_ref[:], p=p_ref[:], q=q_ref[:], v=v_ref[:],
        m=m_ref[:],
    )
    set_mosaic_mode(True)
    try:
        new = engine.step(state, tau_ref[:], pr)
    finally:
        set_mosaic_mode(False)
    s_out[:] = new.s
    sd_out[:] = new.sd
    p_out[:] = new.p
    q_out[:] = new.q
    v_out[:] = new.v
    m_out[:] = new.m


def build_pallas_step_tau(engine: BatchedEngine, tile_sub: int | None = None):
    """Return a jittable ``(state, tau, pr=None) -> state`` fused step where
    ``tau`` has shape ``(n_joints, B1, 128)`` (state shapes as in
    :func:`build_pallas_step`).

    ``pr`` optionally overrides the engine's numeric model arrays (the
    :meth:`BatchedEngine.params` pytree) — the arrays are kernel INPUTS, so
    traced values (e.g. updated link inertias in a co-design loop) flow
    through without recompiling."""
    n, nC = engine.n_joints, engine.m_rows
    tile_sub = TILE_SUB if tile_sub is None else int(tile_sub)
    kernel = functools.partial(_step_tau_kernel, engine)

    def step(state: BatchedState, tau, pr=None) -> BatchedState:
        B1 = state.p.shape[-2]
        ts = _effective_tile(tile_sub, B1)
        grid = (B1 // ts,)

        def spec(lead):
            nlead = len(lead)
            return pl.BlockSpec(
                lead + (ts, TILE_LANE),
                (lambda i, _n=nlead: (0,) * _n + (i, 0)),
                memory_space=pltpu.VMEM,
            )

        state_specs = [
            spec((n,)), spec((n,)), spec((3,)), spec((4,)), spec((6,)),
            spec((nC, 3)),
        ]
        pr = pr if pr is not None else engine.params()

        def full_spec(a):
            nd = a.ndim
            return pl.BlockSpec(
                a.shape, (lambda i, _n=nd: (0,) * _n), memory_space=pltpu.VMEM
            )

        param_order = engine_param_order(engine)
        out_shapes = [
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (state.s, state.sd, state.p, state.q, state.v, state.m)
        ]
        s, sd, p, q, v, m = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=state_specs + [spec((n,))] + [full_spec(pr[k]) for k in param_order],
            out_specs=tuple(state_specs),
            out_shape=tuple(out_shapes),
            compiler_params=_COMPILER_PARAMS,
        )(
            state.s, state.sd, state.p, state.q, state.v, state.m,
            jnp.asarray(tau, dtype=jnp.float32),
            *[pr[k] for k in param_order],
        )
        return BatchedState(s=s, sd=sd, p=p, q=q, v=v, m=m)

    return step


def _step_vjp_kernel(engine: BatchedEngine, params_grad: bool, *refs):
    """Fused BACKWARD kernel: given (state, tau, cotangent-of-output-state),
    computes the cotangents w.r.t. (state, tau) by tracing ``jax.vjp`` of
    the engine step INSIDE the kernel — the transposed graph is still
    elementwise over the batch tiles (no gathers, no cross-env reductions),
    so Mosaic lowers it like the forward. One launch re-runs the forward
    and sweeps the backward entirely in VMEM (SURVEY §7 "hand-written
    VJPs" — here derived mechanically but executed fused).

    With ``params_grad`` the vjp also produces model-parameter cotangents
    (link inertias, contact points, joint placements — hardware co-design).
    Those are batch reductions: each grid step contributes its tile's sum,
    accumulated across sequential grid iterations into constant-index
    output blocks (the standard Pallas TPU accumulation pattern)."""
    order = engine_param_order(engine)
    (s_ref, sd_ref, p_ref, q_ref, v_ref, m_ref, tau_ref) = refs[:7]
    ct_refs = refs[7:13]
    pr = {k: refs[13 + i][:] for i, k in enumerate(order)}
    outs = refs[13 + len(order):]
    state = BatchedState(
        s=s_ref[:], sd=sd_ref[:], p=p_ref[:], q=q_ref[:], v=v_ref[:],
        m=m_ref[:],
    )
    ct_out = BatchedState(*[r[:] for r in ct_refs])
    set_mosaic_mode(True)
    try:
        if params_grad:
            _, vjp_fn = jax.vjp(
                lambda st, t, p: engine.step(st, t, p), state, tau_ref[:], pr
            )
            ct_state, ct_tau, ct_pr = vjp_fn(ct_out)
        else:
            _, vjp_fn = jax.vjp(
                lambda st, t: engine.step(st, t, pr), state, tau_ref[:]
            )
            ct_state, ct_tau = vjp_fn(ct_out)
    finally:
        set_mosaic_mode(False)
    for r, val in zip(
        outs,
        (ct_state.s, ct_state.sd, ct_state.p, ct_state.q, ct_state.v,
         ct_state.m, ct_tau),
    ):
        r[:] = val
    if params_grad:
        i = pl.program_id(0)
        for r, k in zip(outs[7:], order):

            @pl.when(i == 0)
            def _init(r=r, k=k):
                r[:] = ct_pr[k]

            @pl.when(i != 0)
            def _acc(r=r, k=k):
                r[:] = r[:] + ct_pr[k]


def build_pallas_step_vjp(engine: BatchedEngine, tile_sub: int | None = None,
                          params_grad: bool = False):
    """Return a jittable ``(state, tau, ct_state) -> (ct_state_in, ct_tau)``
    running the fused backward kernel (shapes as in
    :func:`build_pallas_step_tau`). With ``params_grad`` the return grows a
    third element: a dict of model-parameter cotangents (summed over the
    whole batch)."""
    n, nC = engine.n_joints, engine.m_rows
    tile_sub = TILE_SUB if tile_sub is None else int(tile_sub)
    kernel = functools.partial(_step_vjp_kernel, engine, params_grad)
    param_order = engine_param_order(engine)

    def bwd(state: BatchedState, tau, ct_out: BatchedState, pr=None):
        B1 = state.p.shape[-2]
        ts = _effective_tile(tile_sub, B1)
        grid = (B1 // ts,)

        def spec(lead):
            nlead = len(lead)
            return pl.BlockSpec(
                lead + (ts, TILE_LANE),
                (lambda i, _n=nlead: (0,) * _n + (i, 0)),
                memory_space=pltpu.VMEM,
            )

        state_specs = [
            spec((n,)), spec((n,)), spec((3,)), spec((4,)), spec((6,)),
            spec((nC, 3)),
        ]
        pr = pr if pr is not None else engine.params()
        pr = {k: jnp.asarray(pr[k], dtype=jnp.float32) for k in param_order}

        def full_spec(a):
            nd = a.ndim
            return pl.BlockSpec(
                a.shape, (lambda i, _n=nd: (0,) * _n), memory_space=pltpu.VMEM
            )

        out_shapes = [
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (state.s, state.sd, state.p, state.q, state.v, state.m)
        ] + [jax.ShapeDtypeStruct(tau.shape, jnp.float32)]
        out_specs = state_specs + [spec((n,))]
        if params_grad:
            out_shapes += [
                jax.ShapeDtypeStruct(pr[k].shape, jnp.float32)
                for k in param_order
            ]
            out_specs += [full_spec(pr[k]) for k in param_order]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=state_specs + [spec((n,))] + state_specs
            + [full_spec(pr[k]) for k in param_order],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            compiler_params=_COMPILER_PARAMS,
        )(
            state.s, state.sd, state.p, state.q, state.v, state.m,
            jnp.asarray(tau, dtype=jnp.float32),
            ct_out.s, ct_out.sd, ct_out.p, ct_out.q, ct_out.v, ct_out.m,
            *[pr[k] for k in param_order],
        )
        if params_grad:
            ct_pr = dict(zip(param_order, out[7:]))
            return BatchedState(*out[:6]), out[6], ct_pr
        return BatchedState(*out[:6]), out[6]

    return bwd


def build_fused_diff_pallas_step(
    engine: BatchedEngine, tile_sub: int | None = None,
    params_grad: bool = False,
):
    """Differentiable fused step whose FORWARD and BACKWARD are both Pallas
    kernels: ``(state, tau) -> state`` with gradients w.r.t. state and tau
    computed by :func:`build_pallas_step_vjp` (one fused launch each way —
    no XLA engine replay, ~2 orders of magnitude faster reverse-mode than
    the XLA fallback).

    With ``params_grad`` the signature becomes ``(state, tau, pr=None)``
    and gradients ALSO flow to the model-parameter pytree ``pr`` (link
    spatial inertias, contact points, joint placements — hardware co-design
    at kernel speed; cotangents are reduced over the batch inside the
    backward kernel). Without it, parameters are constants and the backward
    kernel skips the reduction work."""
    fwd_step = build_pallas_step_tau(engine, tile_sub=tile_sub)
    bwd_step = build_pallas_step_vjp(
        engine, tile_sub=tile_sub, params_grad=params_grad
    )
    param_order = engine_param_order(engine)

    if not params_grad:

        @jax.custom_vjp
        def step(state: BatchedState, tau) -> BatchedState:
            return fwd_step(state, tau)

        def step_fwd(state, tau):
            return fwd_step(state, tau), (state, tau)

        def step_bwd(residual, cotangent):
            state, tau = residual
            return bwd_step(state, tau, cotangent)

        step.defvjp(step_fwd, step_bwd)
        return step

    @jax.custom_vjp
    def _step(state: BatchedState, tau, pr) -> BatchedState:
        return fwd_step(state, tau, pr)

    def _step_fwd(state, tau, pr):
        return fwd_step(state, tau, pr), (state, tau, pr)

    def _step_bwd(residual, cotangent):
        state, tau, pr = residual
        return bwd_step(state, tau, cotangent, pr=pr)

    _step.defvjp(_step_fwd, _step_bwd)

    def step(state: BatchedState, tau, pr=None) -> BatchedState:
        base = engine.params()
        pr = base if pr is None else {**base, **pr}
        pr = {k: jnp.asarray(pr[k], dtype=jnp.float32) for k in param_order}
        return _step(state, tau, pr)

    return step


def build_fused_diff_pallas_rollout(
    engine: BatchedEngine, n_steps: int, tile_sub: int | None = None,
    params_grad: bool = False,
):
    """Differentiable rollout with Pallas forward AND backward per step:
    ``(state, policy_fn, *policy_args) -> state``. The scan saves one state
    + torque tile per step (B=8192, 100 steps ≈ 0.7 GB HBM for the
    humanoid) — no gradient checkpointing needed at these horizons, and
    reverse-mode runs at kernel speed instead of XLA-engine speed
    (BASELINE config 4).

    With ``params_grad`` the rollout accepts a differentiable ``pr`` kwarg
    (model-parameter pytree): co-design gradients w.r.t. inertias / contact
    points / joint placements run through the fused backward kernel too."""
    per_step = build_fused_diff_pallas_step(
        engine, tile_sub=tile_sub, params_grad=params_grad
    )
    param_order = engine_param_order(engine)

    def rollout(state: BatchedState, policy_fn, *policy_args,
                pr=None) -> BatchedState:
        if params_grad:
            base = engine.params()
            prn = base if pr is None else {**base, **pr}
            prn = {
                k: jnp.asarray(prn[k], dtype=jnp.float32) for k in param_order
            }

            def body(st, _):
                return per_step(st, policy_fn(st, *policy_args), prn), None
        else:

            def body(st, _):
                return per_step(st, policy_fn(st, *policy_args)), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return rollout


def build_diff_pallas_step(engine: BatchedEngine, tile_sub: int | None = None):
    """Differentiable fused step: ``(state, tau) -> state`` whose FORWARD is
    the Pallas kernel and whose BACKWARD is the VJP of the numerically
    identical XLA engine step (SURVEY.md §7 "hard parts": fused kernels need
    hand-written VJPs or a scan fallback — this is the fallback wired as a
    ``custom_vjp``, so ``jax.grad`` through rollouts runs the hot forward at
    Pallas speed).

    Gradients flow to the state (BPTT through the physics), the torques
    (policy-gradient / trajectory-optimization workloads), and — when a
    ``pr`` params pytree is passed — the model parameters themselves (link
    spatial inertias ``pr["M"]``, contact points ``pr["cpoint"]``, joint
    placements …), i.e. hardware co-design with the Pallas forward. Memory
    note: reverse-mode saves (state, tau, pr) per step; wrap the step (or
    chunks of the rollout) in ``jax.checkpoint`` for long horizons.
    """
    fwd_step = build_pallas_step_tau(engine, tile_sub=tile_sub)
    param_order = engine_param_order(engine)

    @jax.custom_vjp
    def _step(state: BatchedState, tau, pr) -> BatchedState:
        return fwd_step(state, tau, pr)

    def step_fwd(state, tau, pr):
        return fwd_step(state, tau, pr), (state, tau, pr)

    def step_bwd(residual, cotangent):
        state, tau, pr = residual
        _, vjp_fn = jax.vjp(
            lambda st, t, p: engine.step(st, t, dict(p)), state, tau, pr
        )
        return vjp_fn(cotangent)

    _step.defvjp(step_fwd, step_bwd)

    def step(state: BatchedState, tau, pr=None) -> BatchedState:
        base = engine.params()
        pr = base if pr is None else {**base, **pr}
        # Fixed key set so the custom_vjp pytree structure is stable.
        pr = {k: jnp.asarray(pr[k], dtype=jnp.float32) for k in param_order}
        return _step(state, tau, pr)

    return step


def build_diff_pallas_rollout(engine: BatchedEngine, n_steps: int,
                              checkpoint_chunk: int | None = None,
                              tile_sub: int | None = None):
    """Return a differentiable ``(state, policy_fn, *policy_args) -> state``
    rollout: each step's physics runs in the fused Pallas kernel, torques
    come from ``policy_fn(state, *policy_args)`` evaluated in XLA (so policy
    parameters get gradients), and reverse-mode AD replays the backward pass
    through the XLA engine.

    With ``checkpoint_chunk`` residual memory is bounded to the chunk
    boundaries: each chunk is a chunk-level ``custom_vjp`` whose forward runs
    the fused Pallas steps saving ONLY the chunk's input state, and whose
    backward recomputes the chunk with the XLA engine and differentiates it
    (gradient checkpointing without ``jax.checkpoint``, which cannot
    rematerialize a ``pallas_call``).

    The optional ``pr`` kwarg (a :meth:`BatchedEngine.params` pytree)
    overrides the model parameters and is DIFFERENTIABLE: gradients w.r.t.
    link inertias / contact points / joint placements flow through the
    whole rollout (hardware co-design with the Pallas forward).
    """
    per_step = build_diff_pallas_step(engine, tile_sub=tile_sub)
    param_order = engine_param_order(engine)

    def _norm_pr(pr):
        base = engine.params()
        pr = base if pr is None else {**base, **pr}
        return {k: jnp.asarray(pr[k], dtype=jnp.float32) for k in param_order}

    def run_steps(state, policy_fn, policy_args, pr, length):
        def body(st, _):
            return per_step(st, policy_fn(st, *policy_args), pr), None

        out, _ = jax.lax.scan(body, state, None, length=length)
        return out

    def xla_steps(state, policy_fn, policy_args, pr, length):
        def body(st, _):
            return engine.step(st, policy_fn(st, *policy_args), dict(pr)), None

        out, _ = jax.lax.scan(body, state, None, length=length)
        return out

    def pallas_steps_fwd_only(state, policy_fn, policy_args, pr, length):
        step_tau = build_pallas_step_tau(engine, tile_sub=tile_sub)

        def body(st, _):
            return step_tau(st, policy_fn(st, *policy_args), pr), None

        out, _ = jax.lax.scan(body, state, None, length=length)
        return out

    def make_chunk(length):
        @jax.custom_vjp
        def chunk(state, policy_args, pr):
            return pallas_steps_fwd_only(
                state, policy_fn_holder[0], policy_args, pr, length
            )

        def chunk_fwd(state, policy_args, pr):
            return chunk(state, policy_args, pr), (state, policy_args, pr)

        def chunk_bwd(residual, cotangent):
            state, policy_args, pr = residual
            _, vjp_fn = jax.vjp(
                lambda st, a, p: xla_steps(st, policy_fn_holder[0], a, p, length),
                state,
                policy_args,
                pr,
            )
            return vjp_fn(cotangent)

        chunk.defvjp(chunk_fwd, chunk_bwd)
        return chunk

    # policy_fn arrives at call time but the custom_vjp chunks are built once;
    # a one-slot holder threads it through without retracing machinery.
    policy_fn_holder = [None]
    chunks = {}

    def rollout(state: BatchedState, policy_fn, *policy_args, pr=None) -> BatchedState:
        policy_fn_holder[0] = policy_fn
        pr = _norm_pr(pr)
        if checkpoint_chunk is None:
            return run_steps(state, policy_fn, policy_args, pr, n_steps)
        n_chunks, rem = divmod(n_steps, checkpoint_chunk)
        if checkpoint_chunk not in chunks:
            chunks[checkpoint_chunk] = make_chunk(checkpoint_chunk)
        if rem and rem not in chunks:
            chunks[rem] = make_chunk(rem)

        def body(st, _):
            return chunks[checkpoint_chunk](st, policy_args, pr), None

        state, _ = jax.lax.scan(body, state, None, length=n_chunks)
        if rem:
            state = chunks[rem](state, policy_args, pr)
        return state

    return rollout


def pallas_rollout(engine: BatchedEngine, state: BatchedState, n_steps: int, policy=None):
    """lax.scan rollout over the fused kernel."""
    step = build_pallas_step(engine, policy)

    def body(st, _):
        return step(st), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def tile_state(state: BatchedState) -> BatchedState:
    """Reshape a trailing-(B,) state into the (B1, 128) layout."""
    def rs(a):
        assert a.shape[-1] % TILE_LANE == 0
        return a.reshape(a.shape[:-1] + (a.shape[-1] // TILE_LANE, TILE_LANE))

    return jax.tree.map(rs, state)


def untile_state(state: BatchedState) -> BatchedState:
    return jax.tree.map(
        lambda a: a.reshape(a.shape[:-2] + (a.shape[-2] * a.shape[-1],)), state
    )


def _rollout_kernel(engine: BatchedEngine, policy, n_steps: int,
                    domain: bool, terr_off: bool, morph: bool, *refs):
    """Whole rollout in one kernel: the env-tile state lives in registers/VMEM
    across all ``n_steps`` — no HBM round-trips or kernel launches per step.

    With ``domain``, five extra per-env multiplier tiles (Kmul, Dmul,
    mumul, gmul, Mmul) randomize the contact parameters, gravity, and link
    inertias at call time. With ``morph``, three per-env MORPHOLOGY tiles
    (M, cpoint, lamH — see ``BatchedEngine.per_env_hw_params``) replace
    the shared model arrays: every env simulates a differently-scaled
    robot inside the same launch."""
    order = engine_param_order(engine)
    (s_ref, sd_ref, p_ref, q_ref, v_ref, m_ref) = refs[:6]
    pr = {kk: refs[6 + i][:] for i, kk in enumerate(order)}
    k = 6 + len(order)
    if domain:
        (pr["Kmul"], pr["Dmul"], pr["mumul"], pr["gmul"], pr["Mmul"]) = (
            refs[k][:], refs[k + 1][:], refs[k + 2][:], refs[k + 3][:],
            refs[k + 4][:],
        )
        k += 5
    if terr_off:
        pr["terrOff"] = refs[k][:]
        k += 1
    if morph:
        pr["M"], pr["cpoint"], pr["lamH"] = (
            refs[k][:], refs[k + 1][:], refs[k + 2][:],
        )
        k += 3
    (s_out, sd_out, p_out, q_out, v_out, m_out) = refs[k:k + 6]
    state0 = (s_ref[:], sd_ref[:], p_ref[:], q_ref[:], v_ref[:], m_ref[:])

    set_mosaic_mode(True)
    try:
        def body(_, carry):
            st = BatchedState(*carry)
            new = engine.step(st, policy(st), pr)
            return (new.s, new.sd, new.p, new.q, new.v, new.m)

        s, sd, p, q, v, m = jax.lax.fori_loop(0, n_steps, body, state0)
    finally:
        set_mosaic_mode(False)

    s_out[:] = s
    sd_out[:] = sd
    p_out[:] = p
    q_out[:] = q
    v_out[:] = v
    m_out[:] = m


def _sel(done, fresh, new):
    """Per-env select between respawn and stepped leaves, unrolled over
    leading dims (Mosaic-safe: no rank-extending broadcast of the mask)."""
    if fresh.ndim == done.ndim:
        return jnp.where(done, fresh, new)
    return jnp.stack(
        [_sel(done, fresh[i], new[i]) for i in range(fresh.shape[0])]
    )


def _obs_rows(st: BatchedState, hrel=None):
    """Observation rows ``[s, sd, q, v, p_z]`` as a list of batch tiles
    (matches envs.BatchedEnv's default observation). With ``hrel`` the
    height row is the TERRAIN-RELATIVE height instead of absolute p_z
    (rough-terrain policies cannot act on absolute height)."""
    rows = [st.s[i] for i in range(st.s.shape[0])]
    rows += [st.sd[i] for i in range(st.sd.shape[0])]
    rows += [st.q[i] for i in range(4)]
    rows += [st.v[i] for i in range(6)]
    rows.append(st.p[2] if hrel is None else hrel)
    return rows


def obs_dim(n_joints: int) -> int:
    """Observation size of the default obs ``[s, sd, q, v, p_z]``."""
    return 2 * n_joints + 11


def _linear_policy_tau(st: BatchedState, getW, getb, n_joints: int,
                       tau_limit=None, hrel_fn=None):
    """``tau = W @ obs + b`` unrolled into scalar MACs over batch tiles.
    ``getW(a, k)``/``getb(a)`` read the weights as SCALARS — from SMEM refs
    in the kernel (W/b are call-time inputs, so updated policy weights do
    NOT trigger a kernel recompile; scalar reads from VMEM-loaded arrays
    mis-lower in Mosaic for unaligned minor dims, hence SMEM).
    ``tau_limit`` clips torques to ±limit (actuator saturation)."""
    rows = _obs_rows(st, hrel_fn(st) if hrel_fn is not None else None)
    taus = []
    for a in range(n_joints):
        acc = getb(a) + getW(a, 0) * rows[0]
        for k in range(1, len(rows)):
            acc = acc + getW(a, k) * rows[k]
        if tau_limit is not None:
            acc = jnp.clip(acc, -tau_limit, tau_limit)
        taus.append(acc)
    return jnp.stack(taus)


def _mlp_policy_tau(st: BatchedState, getW1, getb1, getW2, getb2,
                    n_joints: int, hidden: int, tau_limit=None,
                    hrel_fn=None):
    """``tau = W2 @ tanh(W1 @ obs + b1) + b2`` unrolled into scalar MACs
    over batch tiles (one hidden tanh layer; weights read as SMEM scalars
    like :func:`_linear_policy_tau`, so weight updates don't recompile)."""
    rows = _obs_rows(st, hrel_fn(st) if hrel_fn is not None else None)
    hs = []
    for h in range(hidden):
        acc = getb1(h) + getW1(h, 0) * rows[0]
        for kk in range(1, len(rows)):
            acc = acc + getW1(h, kk) * rows[kk]
        hs.append(jnp.tanh(acc))
    taus = []
    for a in range(n_joints):
        acc = getb2(a) + getW2(a, 0) * hs[0]
        for h in range(1, hidden):
            acc = acc + getW2(a, h) * hs[h]
        if tau_limit is not None:
            acc = jnp.clip(acc, -tau_limit, tau_limit)
        taus.append(acc)
    return jnp.stack(taus)


def _env_rollout_kernel(engine: BatchedEngine, policy, reward, n_steps: int,
                        episode_length: int, z_lo: float, z_hi: float,
                        linear_policy: bool, mlp_hidden, domain: bool,
                        terr_off: bool, terrain_rel: bool, tau_limit,
                        reset_noise: float, *refs):
    """RL evaluation rollout in one kernel: step + termination/truncation +
    auto-reset to the episode-start state, with per-env reward accumulation.

    The respawn target is the kernel's own input tile (the episode-start
    state), so auto-reset costs no extra inputs or HBM traffic. With
    ``linear_policy`` the torques are ``W @ obs + b`` where W/b are
    call-time kernel inputs (weight updates don't recompile); with
    ``domain``, per-env Kmul/Dmul/mumul/gmul/Mmul tiles randomize the
    contact params, gravity, and link inertias.
    """
    order = engine_param_order(engine)
    (s_ref, sd_ref, p_ref, q_ref, v_ref, m_ref) = refs[:6]
    pr = {kk: refs[6 + i][:] for i, kk in enumerate(order)}
    k = 6 + len(order)
    if domain:
        (pr["Kmul"], pr["Dmul"], pr["mumul"], pr["gmul"], pr["Mmul"]) = (
            refs[k][:], refs[k + 1][:], refs[k + 2][:], refs[k + 3][:],
            refs[k + 4][:],
        )
        k += 5
    if terr_off:
        pr["terrOff"] = refs[k][:]
        k += 1
    # Terrain-relative height (rough terrain): replaces the absolute p_z in
    # the default observation AND in the healthy-height termination test.
    hrel_fn = (
        (lambda st: st.p[2]
         - engine._fourier_height_grad(pr, st.p[0], st.p[1])[0])
        if terrain_rel
        else None
    )
    if linear_policy:
        n = s_ref.shape[0]
        W_ref, b_ref = refs[k], refs[k + 1]
        k += 2
        if len(W_ref.shape) == 3:
            # Per-tile population weights: SMEM block (1, n, d) selected by
            # the grid index_map — this tile reads its own candidate.
            getW = lambda a, kk: W_ref[0, a, kk]
            getb = lambda a: b_ref[0, a, 0]
        else:
            getW = lambda a, kk: W_ref[a, kk]
            getb = lambda a: b_ref[a, 0]
        policy = lambda st: _linear_policy_tau(
            st, getW, getb, n, tau_limit, hrel_fn
        )
    elif mlp_hidden:
        n = s_ref.shape[0]
        W1_ref, b1_ref, W2_ref, b2_ref = refs[k:k + 4]
        k += 4
        if len(W1_ref.shape) == 3:
            # Per-tile population weights (leading candidate axis).
            getW1 = lambda h, kk: W1_ref[0, h, kk]
            getb1 = lambda h: b1_ref[0, h, 0]
            getW2 = lambda a, h: W2_ref[0, a, h]
            getb2 = lambda a: b2_ref[0, a, 0]
        else:
            getW1 = lambda h, kk: W1_ref[h, kk]
            getb1 = lambda h: b1_ref[h, 0]
            getW2 = lambda a, h: W2_ref[a, h]
            getb2 = lambda a: b2_ref[a, 0]
        policy = lambda st: _mlp_policy_tau(
            st, getW1, getb1, getW2, getb2, n, mlp_hidden, tau_limit,
            hrel_fn
        )
    if reset_noise > 0.0:
        seed_ref = refs[k]
        k += 1
        # Decorrelate tiles: each grid step gets its own PRNG stream.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    (s_out, sd_out, p_out, q_out, v_out, m_out,
     rew_out, resets_out, steps_out) = refs[k:k + 9]
    init = (s_ref[:], sd_ref[:], p_ref[:], q_ref[:], v_ref[:], m_ref[:])
    tile = init[2].shape[1:]

    def _respawn_base_position():
        """Episode-start base position, plus fresh uniform noise with std
        ``reset_noise`` (√3-scaled half-width) drawn in-kernel per step."""
        if reset_noise <= 0.0:
            return init[2]
        half = reset_noise * (3.0 ** 0.5)
        rows = []
        for _ in range(3):
            bits = pltpu.prng_random_bits(tile)
            u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
            rows.append(half * (2.0 * u - 1.0))
        return init[2] + jnp.stack(rows)
    carry0 = init + (
        jnp.zeros(tile, dtype=jnp.int32),  # steps in episode
        jnp.zeros(tile, dtype=jnp.float32),  # reward sum
        jnp.zeros(tile, dtype=jnp.int32),  # resets
    )

    set_mosaic_mode(True)
    try:
        def body(_, carry):
            st = BatchedState(*carry[:6])
            steps, rew_sum, resets = carry[6:]
            tau = policy(st)
            new = engine.step(st, tau, pr)

            steps1 = steps + 1
            z = new.p[2] if hrel_fn is None else hrel_fn(new)
            done = jnp.logical_or(
                jnp.logical_or(z < z_lo, z > z_hi),
                steps1 >= episode_length,
            )
            r = reward(st, tau, new)

            fresh = (init[0], init[1], _respawn_base_position(),
                     init[3], init[4], init[5])
            nxt = tuple(_sel(done, f, n) for f, n in zip(fresh, (
                new.s, new.sd, new.p, new.q, new.v, new.m)))
            return nxt + (
                jnp.where(done, 0, steps1),
                rew_sum + r,
                resets + done.astype(jnp.int32),
            )

        out = jax.lax.fori_loop(0, n_steps, body, carry0)
    finally:
        set_mosaic_mode(False)

    s_out[:] = out[0]
    sd_out[:] = out[1]
    p_out[:] = out[2]
    q_out[:] = out[3]
    v_out[:] = out[4]
    m_out[:] = out[5]
    steps_out[:] = out[6]
    rew_out[:] = out[7]
    resets_out[:] = out[8]


def _default_reward(st, tau, new):
    # Upright-height bonus minus control cost (matches envs.BatchedEnv).
    # The height term is clamped so a diverging env cannot bank an
    # arbitrarily large reward on its final pre-reset transition.
    ctrl = tau[0] * tau[0]
    for i in range(1, tau.shape[0]):
        ctrl = ctrl + tau[i] * tau[i]
    return jnp.minimum(new.p[2], 2.0) - 0.001 * ctrl


def build_pallas_env_rollout(
    engine: BatchedEngine,
    n_steps: int,
    policy=None,
    reward=None,
    episode_length: int = 1000,
    healthy_z_range: tuple = (0.4, 2.0),
    linear_policy: bool = False,
    mlp_policy: int | None = None,
    domain: bool = False,
    terr_off: bool = False,
    terrain_relative: bool = False,
    per_tile_weights: bool = False,
    tau_limit: float | None = None,
    reset_noise: float = 0.0,
    tile_sub: int | None = None,
):
    """Return a jittable rollout running an auto-resetting RL evaluation
    inside ONE kernel launch per batch tile (state shapes as in
    :func:`build_pallas_step`).

    With ``per_tile_weights=True`` (requires ``linear_policy``), W/b carry a
    leading population axis of size ``B1 / 8`` (one candidate per (8, 128)
    env tile): a single launch evaluates the whole POPULATION of policies,
    each on its own 1024-env slice — the primitive for evolution strategies.

    Episodes terminate when base height leaves ``healthy_z_range`` or at
    ``episode_length`` steps; the env respawns at its episode-start state.
    ``reward_sum``/``resets`` are per-env totals over the whole rollout.

    With ``linear_policy=True`` the returned fn is
    ``(state, W, b) -> (state, reward_sum, resets, steps)`` where
    ``W (n_joints, obs_dim)`` / ``b (n_joints, 1)`` are CALL-TIME inputs:
    evaluating updated policy weights does not recompile the kernel. The
    observation is ``[s, sd, q, v, p_z]`` (see :func:`obs_dim`). Otherwise
    the fn is ``state -> (...)`` with a compile-time ``policy`` closure.

    With ``mlp_policy=H`` (an int hidden width, exclusive with
    ``linear_policy``) the policy is a one-hidden-layer tanh MLP
    ``tau = W2 @ tanh(W1 @ obs + b1) + b2`` with CALL-TIME SMEM weights
    ``W1 (H, obs_dim)`` / ``b1 (H, 1)`` / ``W2 (n_joints, H)`` /
    ``b2 (n_joints, 1)`` (leading population axis with
    ``per_tile_weights=True``): nonlinear policy evaluation entirely
    in-kernel, no recompile on weight updates.

    With ``domain=True`` the fn additionally takes per-env multiplier
    tiles ``Kmul/Dmul/mumul`` (contacts) and ``gmul/Mmul``
    (gravity / link inertias) shaped like ``state.p[2]`` (keyword args,
    after the policy weights when both are enabled).

    With ``reset_noise > 0`` respawns perturb the episode-start base
    position with in-kernel uniform noise of that standard deviation
    (per-env, fresh each reset; the ``seed`` call-time kwarg decorrelates
    calls, tiles decorrelate automatically).
    """
    if linear_policy and mlp_policy:
        raise ValueError("pass either linear_policy or mlp_policy, not both")
    if not (linear_policy or mlp_policy):
        policy = policy or (lambda st: -60.0 * st.s - 0.5 * st.sd)
    if per_tile_weights and not (linear_policy or mlp_policy):
        raise ValueError(
            "per_tile_weights requires linear_policy=True or mlp_policy"
        )
    reward = reward or _default_reward
    n, nC = engine.n_joints, engine.m_rows
    z_lo, z_hi = float(healthy_z_range[0]), float(healthy_z_range[1])
    tile_sub = TILE_SUB if tile_sub is None else int(tile_sub)

    if terr_off and engine.terrain_kind != "fourier":
        raise ValueError("terr_off requires a FourierTerrain engine")
    if terrain_relative and engine.terrain_kind != "fourier":
        raise ValueError("terrain_relative requires a FourierTerrain engine")
    kernel = functools.partial(
        _env_rollout_kernel, engine, policy, reward, n_steps,
        int(episode_length), z_lo, z_hi, linear_policy,
        int(mlp_policy) if mlp_policy else None, domain, terr_off,
        terrain_relative,
        float(tau_limit) if tau_limit is not None else None,
        float(reset_noise),
    )

    def rollout(state: BatchedState, W=None, b=None,
                W1=None, b1=None, W2=None, b2=None,
                Kmul=None, Dmul=None, mumul=None, gmul=None, Mmul=None,
                terrOff=None, seed=0):
        B1 = state.p.shape[-2]
        ts = _effective_tile(tile_sub, B1)
        grid = (B1 // ts,)

        def spec(lead):
            nlead = len(lead)
            return pl.BlockSpec(
                lead + (ts, TILE_LANE),
                (lambda i, _n=nlead: (0,) * _n + (i, 0)),
                memory_space=pltpu.VMEM,
            )

        state_specs = [
            spec((n,)), spec((n,)), spec((3,)), spec((4,)), spec((6,)),
            spec((nC, 3)),
        ]
        pr = engine.params()

        def full_spec(a):
            nd = a.ndim
            return pl.BlockSpec(
                a.shape, (lambda i, _n=nd: (0,) * _n), memory_space=pltpu.VMEM
            )

        param_order = engine_param_order(engine)
        extra_in, extra_specs = [], []
        tile_shape = state.p.shape[1:]
        if domain:
            for name, mul in (("Kmul", Kmul), ("Dmul", Dmul), ("mumul", mumul),
                              ("gmul", gmul), ("Mmul", Mmul)):
                mul = jnp.asarray(
                    mul if mul is not None else jnp.ones(tile_shape),
                    dtype=jnp.float32,
                )
                if mul.shape != tile_shape:
                    raise ValueError(
                        f"{name} must have the per-env tile shape"
                        f" {tile_shape}; got {mul.shape}"
                    )
                extra_in.append(mul)
                extra_specs.append(spec(()))
        if terr_off:
            off = jnp.asarray(
                terrOff
                if terrOff is not None
                else jnp.zeros((2,) + tile_shape),
                dtype=jnp.float32,
            )
            if off.shape != (2,) + tile_shape:
                raise ValueError(
                    f"terrOff must have shape {(2,) + tile_shape};"
                    f" got {off.shape}"
                )
            extra_in.append(off)
            extra_specs.append(spec((2,)))
        if linear_policy:
            # Weights live in SMEM: the kernel reads them as scalars, the
            # supported Mosaic pattern (VMEM scalar extraction mis-lowers
            # for unaligned minor dims).
            W = jnp.asarray(W, dtype=jnp.float32)
            if per_tile_weights:
                n_tiles = B1 // ts
                if W.shape != (n_tiles, n, obs_dim(n)):
                    raise ValueError(
                        f"per-tile W must have shape"
                        f" ({n_tiles}, {n}, {obs_dim(n)}) for this batch;"
                        f" got {W.shape}"
                    )
                b = jnp.reshape(
                    jnp.asarray(b, dtype=jnp.float32), (n_tiles, n, 1)
                )
                smem_tile = lambda a: pl.BlockSpec(
                    (1,) + a.shape[1:],
                    (lambda i, _nd=a.ndim: (i,) + (0,) * (_nd - 1)),
                    memory_space=pltpu.SMEM,
                )
                extra_in += [W, b]
                extra_specs += [smem_tile(W), smem_tile(b)]
            else:
                b = jnp.reshape(jnp.asarray(b, dtype=jnp.float32), (n, 1))
                if W.shape != (n, obs_dim(n)):
                    raise ValueError(
                        f"W must have shape ({n}, {obs_dim(n)}); got {W.shape}"
                    )
                smem_full = lambda a: pl.BlockSpec(
                    a.shape,
                    (lambda i, _nd=a.ndim: (0,) * _nd),
                    memory_space=pltpu.SMEM,
                )
                extra_in += [W, b]
                extra_specs += [smem_full(W), smem_full(b)]
        elif mlp_policy:
            H = int(mlp_policy)
            d = obs_dim(n)
            W1 = jnp.asarray(W1, dtype=jnp.float32)
            W2 = jnp.asarray(W2, dtype=jnp.float32)
            if per_tile_weights:
                n_tiles = B1 // ts
                shapes = {
                    "W1": (n_tiles, H, d), "W2": (n_tiles, n, H),
                }
                b1 = jnp.reshape(jnp.asarray(b1, dtype=jnp.float32),
                                 (n_tiles, H, 1))
                b2 = jnp.reshape(jnp.asarray(b2, dtype=jnp.float32),
                                 (n_tiles, n, 1))
                lead = lambda a: pl.BlockSpec(
                    (1,) + a.shape[1:],
                    (lambda i, _nd=a.ndim: (i,) + (0,) * (_nd - 1)),
                    memory_space=pltpu.SMEM,
                )
            else:
                shapes = {"W1": (H, d), "W2": (n, H)}
                b1 = jnp.reshape(jnp.asarray(b1, dtype=jnp.float32), (H, 1))
                b2 = jnp.reshape(jnp.asarray(b2, dtype=jnp.float32), (n, 1))
                lead = lambda a: pl.BlockSpec(
                    a.shape,
                    (lambda i, _nd=a.ndim: (0,) * _nd),
                    memory_space=pltpu.SMEM,
                )
            for name, arr in (("W1", W1), ("W2", W2)):
                if arr.shape != shapes[name]:
                    raise ValueError(
                        f"{name} must have shape {shapes[name]}; got {arr.shape}"
                    )
            extra_in += [W1, b1, W2, b2]
            extra_specs += [lead(W1), lead(b1), lead(W2), lead(b2)]
        if reset_noise > 0.0:
            seed_arr = jnp.reshape(jnp.asarray(seed, dtype=jnp.int32), (1,))
            extra_in.append(seed_arr)
            extra_specs.append(
                pl.BlockSpec((1,), (lambda i: (0,)), memory_space=pltpu.SMEM)
            )
        out_shapes = [
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (state.s, state.sd, state.p, state.q, state.v, state.m)
        ] + [
            jax.ShapeDtypeStruct(tile_shape, jnp.float32),  # reward_sum
            jax.ShapeDtypeStruct(tile_shape, jnp.int32),  # resets
            jax.ShapeDtypeStruct(tile_shape, jnp.int32),  # steps
        ]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=state_specs + [full_spec(pr[k]) for k in param_order]
            + extra_specs,
            out_specs=tuple(state_specs) + (spec(()), spec(()), spec(())),
            out_shape=tuple(out_shapes),
            compiler_params=_COMPILER_PARAMS,
        )(
            state.s, state.sd, state.p, state.q, state.v, state.m,
            *[pr[k] for k in param_order],
            *extra_in,
        )
        final = BatchedState(*out[:6])
        rew_sum, resets, steps = out[6], out[7], out[8]
        return final, rew_sum, resets, steps

    return rollout


def build_pallas_rollout(
    engine: BatchedEngine, n_steps: int, policy=None, domain: bool = False,
    terr_off: bool = False, morph: bool = False, tile_sub: int | None = None,
):
    """Return a jittable rollout advancing ``n_steps`` inside ONE kernel
    launch per batch tile (state shapes as in build_pallas_step).

    With ``domain=True`` the fn is ``(state, Kmul, Dmul, mumul, gmul,
    Mmul) -> state`` where the multipliers are per-env tiles shaped like
    ``state.p[2]`` (``(B1, 128)``): call-time domain randomization of the
    contact parameters, gravity, and link inertias — changing multipliers
    does not recompile."""
    policy = policy or (lambda st: -60.0 * st.s - 0.5 * st.sd)
    n, nC = engine.n_joints, engine.m_rows
    tile_sub = TILE_SUB if tile_sub is None else int(tile_sub)

    if terr_off and engine.terrain_kind != "fourier":
        raise ValueError("terr_off requires a FourierTerrain engine")
    kernel = functools.partial(
        _rollout_kernel, engine, policy, n_steps, domain, terr_off, morph
    )

    def rollout(state: BatchedState, Kmul=None, Dmul=None, mumul=None,
                gmul=None, Mmul=None, terrOff=None, M=None, cpoint=None,
                lamH=None):
        B1 = state.p.shape[-2]
        ts = _effective_tile(tile_sub, B1)
        grid = (B1 // ts,)

        def spec(lead):
            nlead = len(lead)
            return pl.BlockSpec(
                lead + (ts, TILE_LANE),
                (lambda i, _n=nlead: (0,) * _n + (i, 0)),
                memory_space=pltpu.VMEM,
            )

        state_specs = [
            spec((n,)), spec((n,)), spec((3,)), spec((4,)), spec((6,)),
            spec((nC, 3)),
        ]
        pr = engine.params()

        def full_spec(a):
            nd = a.ndim
            return pl.BlockSpec(
                a.shape, (lambda i, _n=nd: (0,) * _n), memory_space=pltpu.VMEM
            )

        param_order = engine_param_order(engine)
        extra_in, extra_specs = [], []
        if domain:
            tile = state.p.shape[1:]
            mults = []
            for name, mul in (("Kmul", Kmul), ("Dmul", Dmul), ("mumul", mumul),
                              ("gmul", gmul), ("Mmul", Mmul)):
                mul = jnp.asarray(
                    mul if mul is not None else jnp.ones(tile), dtype=jnp.float32
                )
                if mul.shape != tile:
                    raise ValueError(
                        f"{name} must have the per-env tile shape {tile};"
                        f" got {mul.shape}"
                    )
                mults.append(mul)
            extra_in = mults
            extra_specs = [spec(())] * 5
        if terr_off:
            tile = state.p.shape[1:]
            off = jnp.asarray(
                terrOff if terrOff is not None else jnp.zeros((2,) + tile),
                dtype=jnp.float32,
            )
            if off.shape != (2,) + tile:
                raise ValueError(
                    f"terrOff must have shape {(2,) + tile}; got {off.shape}"
                )
            extra_in = extra_in + [off]
            extra_specs = extra_specs + [spec((2,))]
        if morph:
            # Per-env morphology tiles (see BatchedEngine.per_env_hw_params;
            # tile the trailing env axis with tile_state/jax.tree.map first).
            tile = state.p.shape[1:]
            nL = engine.n_links
            nJ = engine.n_joints
            for name, a, lead in (
                ("M", M, (nL, 6, 6)),
                ("cpoint", cpoint, (max(engine.n_points, 1), 3)),
                ("lamH", lamH, (1 + nJ, 4, 4)),
            ):
                if a is None:
                    raise ValueError(f"morph=True requires the {name} tile")
                if a.shape != lead + tile:
                    raise ValueError(
                        f"{name} must have shape {lead + tile}; got {a.shape}"
                    )
                extra_in = extra_in + [jnp.asarray(a, dtype=jnp.float32)]
                extra_specs = extra_specs + [spec(lead)]
        out_shapes = [
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (state.s, state.sd, state.p, state.q, state.v, state.m)
        ]
        s, sd, p, q, v, m = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=state_specs + [full_spec(pr[k]) for k in param_order]
            + extra_specs,
            out_specs=tuple(state_specs),
            out_shape=tuple(out_shapes),
            compiler_params=_COMPILER_PARAMS,
        )(
            state.s, state.sd, state.p, state.q, state.v, state.m,
            *[pr[k] for k in param_order],
            *extra_in,
        )
        return BatchedState(s=s, sd=sd, p=p, q=q, v=v, m=m)

    return rollout
