"""Batch-minor simulation engine — the TPU hot path.

The generic API path (``js.model.step`` under ``jax.vmap``) produces
per-env arrays with the batch LEADING and tiny trailing dims like ``(B, 6,
6)``; XLA tiles the minor-most two dims onto the 8×128 VPU/MXU registers, so
6×6 operands waste >95% of each tile and the step is latency-bound.

This engine keeps the batch in the TRAILING axes — every tensor is
``(..., *batch)`` (1D ``(B,)`` or 2D ``(B₁, 128)`` tiles) so element-wise
spatial algebra maps 1:1 onto full VPU lanes — and exploits the static
topology:

* transforms as (R ``(3,3,*b)``, p ``(3,*b)``) pairs — 12 numbers instead of
  a 36-entry adjoint, and fewer FLOPs per application;
* the kinematic-tree sweeps (FK + 3 ABA passes) are unrolled Python loops
  over the static parent array — no gathers, no scan carry;
* the 6×6 articulated-body solve at the base is a hand-unrolled Cholesky on
  batch vectors (no batched-LU tiny-matmuls);
* Hunt/Crossley soft contacts and the semi-implicit Euler update are plain
  element-wise expressions over the batch.

Numeric model parameters are threaded through a ``params`` pytree so the
same code runs (a) under plain XLA with the parameters as embedded
constants, and (b) inside the fused Pallas kernel
(:mod:`jaxsim_tpu.ops.pallas_step`) with the parameters as VMEM inputs.

Math is identical to the reference path (cross-validated in
``tests/test_batched_engine.py``) and supports ``jax.grad`` end-to-end (in
XLA mode).

Role of the reference's "hot loops" — its lax.scan RBDAs
(``src/jaxsim/rbda/aba.py``, ``forward_kinematics.py``) — re-laid-out for
lane-parallel batched execution per SURVEY.md §7.4.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import jaxsim_tpu.typing as jtp
from jaxsim_tpu.utils import pytree_dataclass

# ----------------------------------------------------------------------
# Trailing-batch algebra helpers
# ----------------------------------------------------------------------


# When True, all small matrix algebra is unrolled into elementwise ops so
# Mosaic (Pallas TPU) can lower it; under plain XLA, einsums trace ~10x fewer
# primitives and compile much faster. pallas_step flips this during kernel
# tracing.
_MOSAIC = False


def set_mosaic_mode(on: bool) -> None:
    global _MOSAIC
    _MOSAIC = bool(on)


def _mm(A, B, n):
    """(n,n,*b) @ (n,n,*b)."""
    if not _MOSAIC:
        return jnp.einsum("ij...,jk...->ik...", A, B)
    rows = []
    for i in range(n):
        cols = []
        for j in range(n):
            acc = A[i, 0] * B[0, j]
            for k in range(1, n):
                acc = acc + A[i, k] * B[k, j]
            cols.append(acc)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _mv_u(A, v, n):
    """(n,n,*b) @ (n,*b)."""
    if not _MOSAIC:
        return jnp.einsum("ij...,j...->i...", A, v)
    out = []
    for i in range(n):
        acc = A[i, 0] * v[0]
        for k in range(1, n):
            acc = acc + A[i, k] * v[k]
        out.append(acc)
    return jnp.stack(out)


def _mtv_u(A, v, n):
    """Aᵀ v."""
    if not _MOSAIC:
        return jnp.einsum("ji...,j...->i...", A, v)
    out = []
    for i in range(n):
        acc = A[0, i] * v[0]
        for k in range(1, n):
            acc = acc + A[k, i] * v[k]
        out.append(acc)
    return jnp.stack(out)


def _rr(A, B):
    """(3,3,*b) @ (3,3,*b)."""
    return _mm(A, B, 3)


def _rv(A, v):
    """(3,3,*b) @ (3,*b)."""
    return _mv_u(A, v, 3)


def _rtv(A, v):
    """Aᵀ v."""
    return _mtv_u(A, v, 3)


def _cross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _bc(a, bshape):
    """Reshape a leading-shape array for broadcasting over batch dims."""
    a = jnp.asarray(a, dtype=float)
    return a.reshape(a.shape + (1,) * len(bshape))


def _bvec(v, n, bshape):
    """(n,) vector broadcast to (n, *b). Mosaic mode: scalar splats (no
    rank-extending reshape, which Mosaic cannot lower). A vector that
    ALREADY carries batch dims (per-env morphology overrides) passes
    through untouched."""
    if getattr(v, "ndim", 1) > 1:
        return v
    if not _MOSAIC:
        return jnp.broadcast_to(_bc(v, bshape), (n,) + bshape)
    ones = jnp.ones(bshape)
    return jnp.stack([v[i] * ones for i in range(n)])


def _bmat(M, n, m, bshape):
    """(n,m) matrix broadcast to (n, m, *b) (Mosaic-safe). A matrix that
    ALREADY carries batch dims (per-env morphology overrides) passes
    through untouched."""
    if getattr(M, "ndim", 2) > 2:
        return M
    if not _MOSAIC:
        return jnp.broadcast_to(_bc(M, bshape), (n, m) + bshape)
    ones = jnp.ones(bshape)
    return jnp.stack(
        [jnp.stack([M[i, j] * ones for j in range(m)]) for i in range(n)]
    )


def _quat_to_rot(q):
    """(4,*b) wxyz → (3,3,*b) (norm-robust)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.where(n == 0, 1.0, n)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    one = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([one - (yy + zz), xy - wz, xz + wy]),
            jnp.stack([xy + wz, one - (xx + zz), yz - wx]),
            jnp.stack([xz - wy, yz + wx, one - (xx + yy)]),
        ]
    )


def _xv(R, p, v6):
    """Motion transform [[R, p̂R],[0,R]] applied to (6,*b)."""
    lin, ang = v6[0:3], v6[3:6]
    Ra = _rv(R, ang)
    return jnp.concatenate([_rv(R, lin) + _cross(p, Ra), Ra])


def _xtf(R, p, f6):
    """Force co-transform Xᵀ f for X = [[R, p̂R],[0,R]]:
    Xᵀ = [[Rᵀ, 0],[−Rᵀp̂, Rᵀ]] ⇒ [Rᵀ f_l ; Rᵀ(f_a − p × f_l)]."""
    lin, ang = f6[0:3], f6[3:6]
    return jnp.concatenate([_rtv(R, lin), _rtv(R, ang - _cross(p, lin))])


def _inv_rp(R, p):
    """Inverse transform pair."""
    Rt = jnp.swapaxes(R, 0, 1)
    return Rt, -_rv(Rt, p)


def _build_X(R, p):
    """Explicit 6×6 adjoint (6,6,*b) from an (R, p) pair."""
    zero = jnp.zeros_like(R)
    px = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(p[0]), -p[2], p[1]]),
            jnp.stack([p[2], jnp.zeros_like(p[0]), -p[0]]),
            jnp.stack([-p[1], p[0], jnp.zeros_like(p[0])]),
        ]
    )
    top = jnp.concatenate([R, _rr(px, R)], axis=1)
    bot = jnp.concatenate([zero, R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _chol6_factor(M):
    """Hand-unrolled Cholesky factor L of an SPD (6,6,*b) matrix — all ops
    element-wise over the batch. Returns a 6×6 lower list-of-lists."""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        s = M[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[i][i]
        for j in range(i + 1, 6):
            s = M[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv_d
    return L


def _chol6_substitute(L, b):
    """Forward/backward substitution with a :func:`_chol6_factor` factor."""
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def _chol6_solve(M, b):
    """Solve M x = b for SPD (6,6,*b) M and (6,*b) b."""
    return _chol6_substitute(_chol6_factor(M), b)


def _choln_solve(M_ll, b_list, n):
    """Hand-unrolled Cholesky solve of an SPD n×n system given as a
    list-of-lists of batch-shaped entries and a list of batch-shaped rhs
    components (n static, all ops element-wise over the batch — the same
    Mosaic-safe pattern as :func:`_chol6_solve`, for the 6·nc weld-
    constraint Delassus). Returns a list of n batch-shaped solutions."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = M_ll[i][i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[i][i]
        for j in range(i + 1, n):
            s = M_ll[j][i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b_list[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _rot_log_vee(R):
    """SO(3) log map (3,*b) of a (3,3,*b) rotation, batched element-wise.

    Exact form uses atan2; under Mosaic (whose elementwise set lacks
    atan2/acos) a truncated series of θ/(2·sin θ) in u = 1 − cos θ is used
    instead — relative error < 1e-4 for θ < 60°, far beyond any Baumgarte-
    stabilized weld drift (constraints hold errors at ~1e-3 rad)."""
    w0 = 0.5 * (R[2, 1] - R[1, 2])
    w1 = 0.5 * (R[0, 2] - R[2, 0])
    w2 = 0.5 * (R[1, 0] - R[0, 1])
    c = jnp.clip(0.5 * (R[0, 0] + R[1, 1] + R[2, 2] - 1.0), -1.0, 1.0)
    if _MOSAIC:
        u = 1.0 - c
        # θ/sin θ = 1 + u/3 + 2u²/15 + O(u³)  (u = 1 − cos θ).
        factor = 1.0 + u * (1.0 / 3.0) + u * u * (2.0 / 15.0)
    else:
        s = jnp.sqrt(jnp.maximum(w0 * w0 + w1 * w1 + w2 * w2, 1e-24))
        theta = jnp.arctan2(s, c)
        factor = jnp.where(s < 1e-6, 1.0, theta / s)
    return jnp.stack([factor * w0, factor * w1, factor * w2])


def _skew3(a, bshape):
    """Skew matrix (3,3,*b) of a possibly-traced (3,) vector."""
    z = jnp.zeros(bshape) if bshape else jnp.asarray(0.0)
    a0 = a[0] * jnp.ones(bshape) if bshape else a[0]
    a1 = a[1] * jnp.ones(bshape) if bshape else a[1]
    a2 = a[2] * jnp.ones(bshape) if bshape else a[2]
    return jnp.stack(
        [
            jnp.stack([z, -a2, a1]),
            jnp.stack([a2, z, -a0]),
            jnp.stack([-a1, a0, z]),
        ]
    )


# ----------------------------------------------------------------------
# State + engine
# ----------------------------------------------------------------------


@pytree_dataclass
class BatchedState:
    """Structure-of-arrays env-batch state: every leaf has trailing batch."""

    s: jtp.Array  # (n, *b)
    sd: jtp.Array  # (n, *b)
    p: jtp.Array  # (3, *b) base position
    q: jtp.Array  # (4, *b) base quaternion (wxyz)
    v: jtp.Array  # (6, *b) base inertial velocity
    m: jtp.Array  # (nC, 3, *b) tangential deformation


@dataclasses.dataclass(frozen=True)
class BatchedEngine:
    """Static topology + scalar parameters; numeric arrays via params()."""

    n_links: int
    n_joints: int
    n_points: int
    lam: tuple  # parent array (static ints)
    joint_types: tuple
    contact_parent: tuple  # (nC,) static ints
    K: float
    D: float
    mu: float
    hc_p: float
    hc_q: float
    gravity_z: float
    dt: float
    floating_base: bool
    # Plane terrain through (0, 0, H) with static unit normal n̂ = (a, b, c);
    # terrain_offset = c·H so penetration is δ = max(0, offset − n̂·p).
    # The default (ẑ, 0) keeps the specialized flat-ground code path.
    terrain_normal: tuple = (0.0, 0.0, 1.0)
    terrain_offset: float = 0.0
    # Terrain kind: "plane" (static normal/offset above), "fourier"
    # (spectral rough terrain — height and analytic normal are elementwise
    # trig over the static spectrum in params()["terr"], so the fused
    # kernel evaluates the terrain in-kernel), or "heightmap" (bilinear
    # grid lookup — XLA engine only: the per-lane gathers don't lower to
    # Mosaic). All three compose with all three contact models.
    terrain_kind: str = "plane"
    # Heightmap extent (x0, x1, y0, y1) for terrain_kind == "heightmap".
    terrain_extent: tuple = (-5.0, 5.0, -5.0, 5.0)
    # Fixed-step integrator: "sie" (semi-implicit Euler), "rk4", or
    # "rk4fast" (RK4 with contact forces frozen at t0) — mirrors the generic
    # api.integrators choices (reference ``api/integrators.py``).
    integrator: str = "sie"
    # Contact model: "soft" (Hunt/Crossley) or "relaxed_rigid" (MJX-style
    # soft-constraint solve, reference ``rbda/contacts/relaxed_rigid.py``).
    contact_model: str = "soft"
    # Relaxed-rigid parameters (resolved scalars; see ops/contacts/
    # relaxed_rigid.py for the K/D resolution from the time constant).
    rr_d_min: float = 0.9
    rr_d_max: float = 0.95
    rr_width: float = 0.001
    rr_midpoint: float = 0.5
    rr_power: float = 2.0
    rr_stiff: float = 0.0
    rr_damp: float = 0.0
    rr_reg: float = 1e-6
    # Fixed PCG iteration count for the contact solve (0 = auto: the
    # solve WARM-STARTS from the previous step's forces carried in the
    # ``m`` state slot, so min(nC/4 + 6, 10) tracks the exact solve on
    # rollouts — see docs/ops.md for the accuracy study; tests use
    # 3·nC + 4 for exact-solve agreement).
    rr_iterations: int = 0
    # Rigid (QP) contact parameters: Delassus regularization and fixed
    # APGD iteration count (0 = auto: min(nC//2 + 10, 24) — the solve
    # warm-starts from the previous step's forces carried in ``m``; see
    # docs/ops.md for the accuracy study).
    rigid_reg: float = 1e-6
    rigid_iterations: int = 0
    # Power-iteration count for the APGD Lipschitz estimate (the safety
    # factor below covers the from-below convergence of a short run —
    # 3 iterations at 1.8x matches the 8-at-1.25x trajectories to ~4e-5 m
    # on the humanoid study, docs/ops.md).
    rigid_power_iterations: int = 3
    rigid_power_safety: float = 1.8
    # CG iteration count for the post-step inelastic impact projection
    # (0 = auto: min(nC//4 + 6, 12); no warm start exists for impulses).
    rigid_impact_iterations: int = 0
    # Neumann iteration count for the APGD fixed point's implicit VJP
    # (0 = auto: max(64, 3·forward iterations)). The backward contraction
    # is the UNaccelerated PGD map, so it needs more iterations than the
    # FISTA forward to reach the same tolerance.
    rigid_bwd_iterations: int = 0
    # Weld (frame-pair) kinematic constraints lowered from ConstraintMap
    # (reference ``rbda/kinematic_constraints.py:19-345``): static parent
    # link pairs and Baumgarte gains; the frame offsets live in params()
    # as ``cH1``/``cH2``. The Delassus system is assembled matrix-free
    # (6·nc M⁻¹ applications) and solved exactly with an unrolled
    # Cholesky — see :meth:`constraint_wrenches`.
    constraint_parents: tuple = ()  # ((P1, P2), ...) static link indices
    constraint_kp: tuple = ()  # per-constraint static Baumgarte gains
    constraint_kd: tuple = ()
    constraint_reg: float = 1e-3

    # Numeric model arrays, kept as nested tuples (hashable, numpy-convertible).
    _S: tuple = dataclasses.field(repr=False, default=())
    _M_links: tuple = dataclasses.field(repr=False, default=())
    _joint_axis: tuple = dataclasses.field(repr=False, default=())
    _lambda_H_pre: tuple = dataclasses.field(repr=False, default=())
    _suc_H_i: tuple = dataclasses.field(repr=False, default=())
    _contact_point: tuple = dataclasses.field(repr=False, default=())
    _rr_Minv: tuple = dataclasses.field(repr=False, default=())
    _rr_Kc: tuple = dataclasses.field(repr=False, default=())
    _constraint_H1: tuple = dataclasses.field(repr=False, default=())
    _constraint_H2: tuple = dataclasses.field(repr=False, default=())
    _terrain_spec: tuple = dataclasses.field(repr=False, default=())

    @staticmethod
    def build(model) -> "BatchedEngine":
        from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts
        from jaxsim_tpu.ops.contacts.rigid import RigidContacts
        from jaxsim_tpu.ops.contacts.soft import SoftContacts
        from jaxsim_tpu.terrain import FlatTerrain

        # The fused hot path implements flat/inclined-plane terrain, all
        # three contact models (soft / rigid QP / relaxed-rigid), all
        # three fixed-step integrators (SIE / RK4 / RK4-fast), and weld
        # kinematic constraints; other configurations use the generic
        # js.model.step path.
        con = {}
        kc = model.kin_dyn_parameters.constraints
        if kc is not None and len(kc) > 0:
            if any(t != 0 for t in kc.constraint_types):
                raise ValueError(
                    "BatchedEngine implements Weld constraints only"
                )
            nl_ = model.number_of_links()
            fp = model.kin_dyn_parameters.frame_parameters
            fp_body = np.asarray(fp.body)
            fp_H = np.asarray(fp.transform)
            parents, H1, H2 = [], [], []
            for i in range(len(kc)):
                k1 = kc.frame_idxs_1[i] - nl_
                k2 = kc.frame_idxs_2[i] - nl_
                if k1 < 0 or k2 < 0 or k1 >= len(fp_body) or k2 >= len(fp_body):
                    raise ValueError(
                        "weld constraint endpoints must be FRAME indices"
                        f" (got {kc.frame_idxs_1[i]}, {kc.frame_idxs_2[i]};"
                        f" frames start at {nl_})"
                    )
                parents.append((int(fp_body[k1]), int(fp_body[k2])))
                H1.append(fp_H[k1])
                H2.append(fp_H[k2])
            con = dict(
                constraint_parents=tuple(parents),
                constraint_kp=tuple(float(x) for x in np.asarray(kc.K_P)),
                constraint_kd=tuple(float(x) for x in np.asarray(kc.K_D)),
                _constraint_H1=_freeze(np.stack(H1)),
                _constraint_H2=_freeze(np.stack(H2)),
            )
        from jaxsim_tpu.terrain import FourierTerrain, HeightmapTerrain

        terr = {}
        t_normal = (0.0, 0.0, 1.0)
        t_offset = 0.0
        if isinstance(model.terrain, FourierTerrain):
            t_offset = float(model.terrain._h0)
            terr = dict(
                terrain_kind="fourier",
                _terrain_spec=_freeze(model.terrain.spectrum()),
            )
        elif isinstance(model.terrain, HeightmapTerrain):
            terr = dict(
                terrain_kind="heightmap",
                terrain_extent=tuple(float(x) for x in model.terrain._extent),
                _terrain_spec=_freeze(model.terrain._grid.get()),
            )
        elif isinstance(model.terrain, FlatTerrain):
            t_normal = tuple(
                float(x)
                for x in getattr(model.terrain, "_normal", (0.0, 0.0, 1.0))
            )
            t_offset = t_normal[2] * float(
                getattr(model.terrain, "_height", 0.0)
            )
        else:
            raise ValueError(
                "BatchedEngine supports flat/plane/Fourier terrain; use the"
                " generic js.model.step path for other terrains"
            )
        rr = {}
        if isinstance(model.contact_model, RigidContacts):
            rr = dict(
                contact_model="rigid",
                rigid_reg=float(model.contact_model.regularization_delassus),
            )
        elif isinstance(model.contact_model, RelaxedRigidContacts):
            p = model.contact_params
            xi_max = float(p.d_max)
            Omega = float(p.time_constant)
            zeta = float(p.damping_coefficient)
            K_user, D_user = float(p.K), float(p.D)
            stiff = 1.0 / (xi_max * Omega * zeta) ** 2
            damp = 2.0 / (xi_max * Omega)
            if K_user < 0:
                stiff = -K_user / xi_max**2
            if D_user < 0:
                damp = -D_user / xi_max
            rr = dict(
                contact_model="relaxed_rigid",
                rr_d_min=float(p.d_min),
                rr_d_max=xi_max,
                rr_width=float(p.width),
                rr_midpoint=float(p.midpoint),
                rr_power=float(p.power),
                rr_stiff=stiff,
                rr_damp=damp,
                rr_reg=float(model.contact_model.regularization),
            )
        elif not isinstance(model.contact_model, SoftContacts):
            raise ValueError(
                "BatchedEngine implements soft, rigid (QP), and"
                " relaxed-rigid contacts; use the generic js.model.step"
                " path for custom contact models"
            )
        from jaxsim_tpu.api.model import IntegratorType

        integrator = {
            IntegratorType.SemiImplicitEuler: "sie",
            IntegratorType.RungeKutta4: "rk4",
            IntegratorType.RungeKutta4Fast: "rk4fast",
        }[model.integrator]
        kdp = model.kin_dyn_parameters
        cp = kdp.contact_parameters
        idx = cp.indices_of_enabled_collidable_points
        pars = model.contact_params
        if rr.get("contact_model") == "relaxed_rigid":
            # Per-point inverse 3×3 linear-mass blocks of the parent links
            # (static — used by the diagonal regularizer and the Jacobi
            # preconditioner of the contact PCG).
            M_L = np.asarray(kdp.link_parameters.spatial_inertia())
            rr["_rr_Minv"] = _freeze(
                np.stack(
                    [
                        np.linalg.inv(M_L[int(cp.body[i])][0:3, 0:3])
                        for i in idx
                    ]
                )
                if len(idx)
                else np.zeros((0, 3, 3))
            )
        eng = BatchedEngine(
            **rr,
            **con,
            **terr,
            n_links=kdp.number_of_links(),
            n_joints=kdp.number_of_joints(),
            n_points=len(idx),
            lam=tuple(kdp.parent_array_static),
            joint_types=tuple(kdp.joint_model.joint_types),
            contact_parent=tuple(int(cp.body[i]) for i in idx),
            # K/D: Hunt/Crossley terrain stiffness (soft), Baumgarte
            # stabilization gains (rigid), unused for relaxed-rigid.
            K=float(getattr(pars, "K", 0.0))
            if rr.get("contact_model") != "relaxed_rigid"
            else 0.0,
            D=float(getattr(pars, "D", 0.0))
            if rr.get("contact_model") != "relaxed_rigid"
            else 0.0,
            mu=float(pars.mu),
            hc_p=float(getattr(pars, "p", 0.0)),
            hc_q=float(getattr(pars, "q", 0.0)),
            gravity_z=float(model.gravity),
            dt=float(model.time_step),
            floating_base=model.floating_base(),
            terrain_normal=t_normal,
            terrain_offset=t_offset,
            integrator=integrator,
            _S=_freeze(kdp.motion_subspaces),
            _M_links=_freeze(kdp.link_parameters.spatial_inertia()),
            _joint_axis=_freeze(kdp.joint_model.joint_axis),
            _lambda_H_pre=_freeze(kdp.joint_model.lambda_H_pre),
            _suc_H_i=_freeze(kdp.joint_model.suc_H_i),
            _contact_point=_freeze(cp.point[jnp.array(idx, dtype=int)])
            if len(idx)
            else (),
        )
        if (
            eng.contact_model == "relaxed_rigid"
            and eng.n_points
            and eng.terrain_kind != "plane"
        ):
            # Rough terrain mixes per-point contact normals, widening the
            # Delassus spectrum; the scalar (1/m) Jacobi preconditioner
            # then needs 24+ PCG iterations to stay stable at touchdown.
            # A block-Jacobi preconditioner built from the true nominal
            # per-point Delassus blocks halves that budget (docs/ops.md).
            eng = dataclasses.replace(
                eng, _rr_Kc=_freeze(_nominal_delassus_blocks(model))
            )
        return eng

    def params(self) -> dict[str, jtp.Array]:
        """Numeric model arrays as a pytree: embedded constants under XLA,
        or VMEM kernel inputs under Pallas."""
        return dict(
            S=jnp.asarray(np.asarray(self._S), dtype=float),
            M=jnp.asarray(np.asarray(self._M_links), dtype=float),
            axis=jnp.asarray(np.asarray(self._joint_axis), dtype=float),
            lamH=jnp.asarray(np.asarray(self._lambda_H_pre), dtype=float),
            sucH=jnp.asarray(np.asarray(self._suc_H_i), dtype=float),
            # Contact-free models pad to one zero row (never read — the
            # contact loops are empty) so every kernel input has a
            # tileable nonzero block.
            cpoint=jnp.asarray(np.asarray(self._contact_point), dtype=float)
            if self.n_points
            else jnp.zeros((1, 3)),
            **(
                dict(rrMinv=jnp.asarray(np.asarray(self._rr_Minv), dtype=float))
                if self.contact_model == "relaxed_rigid"
                else {}
            ),
            **(
                dict(rrKc=jnp.asarray(np.asarray(self._rr_Kc), dtype=float))
                if self._rr_Kc
                else {}
            ),
            **(
                dict(
                    cH1=jnp.asarray(np.asarray(self._constraint_H1), dtype=float),
                    cH2=jnp.asarray(np.asarray(self._constraint_H2), dtype=float),
                )
                if self.constraint_parents
                else {}
            ),
            **(
                dict(
                    terr=jnp.asarray(np.asarray(self._terrain_spec), dtype=float)
                )
                if self.terrain_kind in ("fourier", "heightmap")
                else {}
            ),
        )

    def per_env_hw_params(self, model, scaling_factors) -> dict:
        """Per-env MORPHOLOGY overrides from a batched ``ScalingFactors``
        (leading env axis of length B): returns ``{"M", "cpoint", "lamH"}``
        trailing-batch arrays to merge into ``pr`` (or pass as
        ``rollout(domain=...)``) so every env simulates a differently-scaled
        robot — population-based co-design at engine speed (the per-model
        analog is reference ``api/model.py:2461-2593``).

        The model must carry hw metadata (``js.hw_parameters.with_hw_metadata``).
        Exact for soft-contact engines; relaxed-rigid/rigid engines keep the
        NOMINAL ``rrMinv`` regularizer weights (the solve still converges,
        with the impedance weights of the unscaled model).
        """
        import jaxsim_tpu.api as js

        idx = np.asarray(
            model.kin_dyn_parameters.contact_parameters.indices_of_enabled_collidable_points,
            dtype=int,
        )

        def one(sf):
            m2 = js.model.update_hw_parameters(model, sf)
            kdp2 = m2.kin_dyn_parameters
            return (
                kdp2.link_parameters.spatial_inertia(),
                kdp2.contact_parameters.point[idx]
                if len(idx)
                else jnp.zeros((1, 3)),
                kdp2.joint_model.lambda_H_pre,
            )

        M, cp, lamH = jax.vmap(one)(scaling_factors)
        mv = lambda a: jnp.moveaxis(a, 0, -1)
        return {"M": mv(M), "cpoint": mv(cp), "lamH": mv(lamH)}

    @property
    def n_constraints(self) -> int:
        return len(self.constraint_parents)

    @property
    def m_rows(self) -> int:
        """Leading size of the ``m`` state leaf: contact-free models carry
        ONE inert zero row instead of an empty array — Mosaic/interpret
        cannot tile a zero-size block, and the padding costs nothing
        (every contact path is statically skipped when n_points == 0)."""
        return max(self.n_points, 1)

    # ----- state conversion -----

    def state_from_data(self, data) -> BatchedState:
        """Batched JaxSimModelData (leading B) → BatchedState (trailing B)."""
        T = lambda a, k: jnp.moveaxis(jnp.asarray(a), 0, k)
        B = data.base_position.shape[0]
        m = data.contact_state.get("tangential_deformation")
        if m is None or self.n_points == 0:
            m = jnp.zeros((B, self.m_rows, 3))
        return BatchedState(
            s=T(data.joint_positions, -1).reshape(self.n_joints, B),
            sd=T(data.joint_velocities, -1).reshape(self.n_joints, B),
            p=T(data.base_position, -1),
            q=T(data.base_quaternion, -1),
            v=jnp.concatenate(
                [
                    T(data.base_linear_velocity_inertial, -1),
                    T(data.base_angular_velocity_inertial, -1),
                ]
            ),
            m=jnp.moveaxis(m, 0, -1),
        )

    def data_from_state(self, model, state: BatchedState):
        """BatchedState → batched JaxSimModelData (recomputes caches)."""
        import jaxsim_tpu.api as js

        T = lambda a: jnp.moveaxis(a, -1, 0)
        data = jax.vmap(
            lambda p, q, s, v, sd: js.JaxSimModelData.build(
                model,
                base_position=p,
                base_quaternion=q,
                joint_positions=s,
                base_linear_velocity=v[0:3],
                base_angular_velocity=v[3:6],
                joint_velocities=sd,
                velocity_representation=js.VelRepr.Inertial,
            )
        )(T(state.p), T(state.q), T(state.s), T(state.v), T(state.sd))
        # For rigid/relaxed-rigid engines m carries the warm-start contact
        # forces, which are internal solver state — not material
        # deformation. Contact-free engines carry one inert padding row
        # (see m_rows) that the generic data must not see.
        if self.n_points == 0:
            m_out = jnp.zeros((0, 3) + state.m.shape[2:])
        elif self.contact_model in ("rigid", "relaxed_rigid"):
            m_out = jnp.zeros_like(state.m)
        else:
            m_out = state.m
        return dataclasses.replace(
            data,
            contact_state={"tangential_deformation": jnp.moveaxis(m_out, -1, 0)},
        )

    def init_state(
        self, B: int, *, base_position=(0.0, 0.0, 0.9), key=None
    ) -> BatchedState:
        p0 = jnp.tile(jnp.asarray(base_position, dtype=float)[:, None], (1, B))
        if key is not None:
            p0 = p0 + 0.01 * jax.random.normal(key, (3, B))
        q0 = jnp.tile(jnp.array([1.0, 0, 0, 0])[:, None], (1, B))
        return BatchedState(
            s=jnp.zeros((self.n_joints, B)),
            sd=jnp.zeros((self.n_joints, B)),
            p=p0,
            q=q0,
            v=jnp.zeros((6, B)),
            m=jnp.zeros((self.m_rows, 3, B)),
        )

    # ----- kinematics -----

    def _relative_transforms(self, s, pr):
        """Forward parent→child (R, p) pairs per joint i = 1..nL-1."""
        out_R, out_p = [], []
        for j in range(1, self.n_joints + 1):
            lamH = pr["lamH"][j]
            sucH = pr["sucH"][j]
            jt = self.joint_types[j]
            th = s[j - 1]
            bshape = th.shape
            if jt == 1:  # revolute: Rodrigues about the static axis
                axis = pr["axis"][j - 1]
                K = _skew3(axis, ())
                K2 = K @ K
                sin, cos = jnp.sin(th), jnp.cos(th)
                eye_np = jnp.eye(3)
                # Scalar splats per component (Mosaic-safe, fuses under XLA).
                R_j = jnp.stack(
                    [
                        jnp.stack(
                            [
                                eye_np[r, c2]
                                + sin * K[r, c2]
                                + (1 - cos) * K2[r, c2]
                                for c2 in range(3)
                            ]
                        )
                        for r in range(3)
                    ]
                )
                p_j = jnp.zeros((3,) + bshape)
            elif jt == 2:  # prismatic
                axis = pr["axis"][j - 1]
                R_j = _bmat(jnp.eye(3), 3, 3, bshape)
                p_j = jnp.stack([axis[r] * th for r in range(3)])
            else:  # fixed
                R_j = _bmat(jnp.eye(3), 3, 3, bshape)
                p_j = jnp.zeros((3,) + bshape)

            # λ_H_i = λ_H_pre ∘ joint ∘ suc_H_i.
            R1, p1 = lamH[:3, :3], lamH[:3, 3]
            R2, p2 = sucH[:3, :3], sucH[:3, 3]
            R1b = _bmat(R1, 3, 3, bshape)
            R_a = _mm(R1b, R_j, 3)
            p_a = _bvec(p1, 3, bshape) + _mv_u(R1b, p_j, 3)
            R_t = _mm(R_a, _bmat(R2, 3, 3, bshape), 3)
            p_t = p_a + _rv(R_a, _bvec(p2, 3, bshape))
            out_R.append(R_t)
            out_p.append(p_t)
        return out_R, out_p

    def fk(self, state: BatchedState, pr=None):
        """World (R, p) pose pairs + inertial 6D velocities of all links."""
        pr = pr if pr is not None else self.params()
        bshape = state.p.shape[1:]
        rel_R, rel_p = self._relative_transforms(state.s, pr)

        R_B = _quat_to_rot(state.q)
        suc0 = pr["sucH"][0]
        W_R = [_mm(R_B, _bmat(suc0[:3, :3], 3, 3, bshape), 3)]
        W_p = [state.p + _rv(R_B, _bvec(suc0[:3, 3], 3, bshape))]
        W_v = [state.v if self.floating_base else jnp.zeros((6,) + bshape)]

        for i in range(1, self.n_links):
            lam = self.lam[i]
            Rl, pl = W_R[lam], W_p[lam]
            Ri = _rr(Rl, rel_R[i - 1])
            pi = pl + _rv(Rl, rel_p[i - 1])
            W_R.append(Ri)
            W_p.append(pi)
            S = pr["S"][i]
            sdi = state.sd[i - 1]
            Sl = jnp.stack([S[k] * sdi for k in range(3)])
            Sa = jnp.stack([S[k + 3] * sdi for k in range(3)])
            RSa = _rv(Ri, Sa)
            dv = jnp.concatenate([_rv(Ri, Sl) + _cross(pi, RSa), RSa])
            W_v.append(W_v[lam] + dv)
        return W_R, W_p, W_v

    # ----- contacts -----

    def _fourier_height_grad(self, pr, x, y):
        """Height h(x, y) and gradient (∂h/∂x, ∂h/∂y) of the spectral
        terrain, element-wise over the batch (the static component count
        unrolls — sin/cos on the VPU, no gathers, so this evaluates
        inside the fused kernel). Optional per-env ``pr["terrOff"]``
        ((2,) or (2, *b)) translates each env's terrain query — per-env
        rough-terrain domain randomization at the cost of two subtracts."""
        T = pr["terr"]
        K = int(T.shape[1])
        if "terrOff" in pr:
            x = x - pr["terrOff"][0]
            y = y - pr["terrOff"][1]
        h = jnp.zeros_like(x)
        dhx = jnp.zeros_like(x)
        dhy = jnp.zeros_like(x)
        for k in range(K):
            a, kx, ky, ph = T[0, k], T[1, k], T[2, k], T[3, k]
            arg = kx * x + ky * y + ph
            h = h + a * jnp.sin(arg)
            c_ = a * jnp.cos(arg)
            dhx = dhx + kx * c_
            dhy = dhy + ky * c_
        return self.terrain_offset + h, dhx, dhy

    def _heightmap_height_grad(self, pr, x, y):
        """Bilinear height h(x, y) and analytic in-cell gradient over the
        static grid in ``pr["terr"]`` (XLA engine path only — the per-lane
        gathers don't lower to Mosaic). Same optional per-env
        ``pr["terrOff"]`` translation as the Fourier terrain."""
        grid = pr["terr"]
        ny, nx = grid.shape
        x0, x1, y0, y1 = self.terrain_extent
        if "terrOff" in pr:
            x = x - pr["terrOff"][0]
            y = y - pr["terrOff"][1]
        sx = (x1 - x0) / (nx - 1)
        sy = (y1 - y0) / (ny - 1)
        gx = jnp.clip((x - x0) / sx, 0.0, nx - 1 - 1e-6)
        gy = jnp.clip((y - y0) / sy, 0.0, ny - 1 - 1e-6)
        ix = jnp.floor(gx).astype(int)
        iy = jnp.floor(gy).astype(int)
        fx = gx - ix
        fy = gy - iy
        h00 = grid[iy, ix]
        h01 = grid[iy, ix + 1]
        h10 = grid[iy + 1, ix]
        h11 = grid[iy + 1, ix + 1]
        h = (
            h00 * (1 - fx) * (1 - fy)
            + h01 * fx * (1 - fy)
            + h10 * (1 - fx) * fy
            + h11 * fx * fy
        )
        dhx = ((h01 - h00) * (1 - fy) + (h11 - h10) * fy) / sx
        dhy = ((h10 - h00) * (1 - fx) + (h11 - h01) * fx) / sy
        return self.terrain_offset + h, dhx, dhy

    def _terrain_height_grad(self, pr, x, y):
        """Dispatch height/gradient for the rough terrain kinds."""
        if self.terrain_kind == "fourier":
            return self._fourier_height_grad(pr, x, y)
        if self.terrain_kind == "heightmap":
            return self._heightmap_height_grad(pr, x, y)
        raise ValueError(f"not a rough terrain kind: {self.terrain_kind}")

    def soft_contact_forces(self, W_R, W_p, W_v, m, pr=None):
        """Hunt/Crossley per point; per-link 6D inertial forces (list of
        (6,*b) or None) and ṁ (nC,3,*b). Plane terrain with static normal
        n̂ = terrain_normal through offset = terrain_offset (flat ground at
        z = 0 keeps a specialized zero-multiply code path).

        Per-env domain randomization: optional batch-shaped multipliers
        ``pr["Kmul"]/["Dmul"]/["mumul"]`` scale the contact parameters
        elementwise over envs (absent keys cost nothing — the scalar
        constants fold at trace time)."""
        pr = pr if pr is not None else self.params()
        bshape = W_p[0].shape[1:]
        f_links = [None] * self.n_links
        md_list = []
        eps = jnp.finfo(jnp.float32).eps
        ax, ay, az = self.terrain_normal
        off = self.terrain_offset
        fourier = self.terrain_kind in ("fourier", "heightmap")
        flat = (
            (ax, ay, az) == (0.0, 0.0, 1.0) and off == 0.0 and not fourier
        )
        K = self.K * pr["Kmul"] if "Kmul" in pr else self.K
        D = self.D * pr["Dmul"] if "Dmul" in pr else self.D
        mu = self.mu * pr["mumul"] if "mumul" in pr else self.mu

        for c in range(self.n_points):
            parent = self.contact_parent[c]
            Lp = pr["cpoint"][c]
            Rp, pp, vp = W_R[parent], W_p[parent], W_v[parent]
            pc = _rv(Rp, _bvec(Lp, 3, bshape)) + pp
            pd = vp[0:3] + _cross(vp[3:6], pc)

            mc = m[c]
            zb = jnp.zeros_like(pd[0])
            if flat:
                delta = jnp.maximum(0.0, -pc[2])
                delta_dot = jnp.where(delta > 0, -pd[2], 0.0)
            elif fourier:
                # Rough terrain: analytic height/normal from the spectrum
                # or heightmap grid (per-point, per-env batch-shaped
                # normals; mirrors compute_penetration_data's
                # δ = (h − z)·n̂_z).
                h, dhx, dhy = self._terrain_height_grad(pr, pc[0], pc[1])
                inv_n = 1.0 / jnp.sqrt(dhx * dhx + dhy * dhy + 1.0)
                axc, ayc, azc = -dhx * inv_n, -dhy * inv_n, inv_n
                ndotv = axc * pd[0] + ayc * pd[1] + azc * pd[2]
                delta = jnp.maximum(0.0, (h - pc[2]) * azc)
                delta_dot = jnp.where(delta > 0, -ndotv, 0.0)
            else:
                ndotp = ax * pc[0] + ay * pc[1] + az * pc[2]
                ndotv = ax * pd[0] + ay * pd[1] + az * pd[2]
                delta = jnp.maximum(0.0, off - ndotp)
                delta_dot = jnp.where(delta > 0, -ndotv, 0.0)
            if fourier:
                nax, nay, naz = axc, ayc, azc
            else:
                nax, nay, naz = ax, ay, az

            dp = jnp.power(delta + eps, self.hc_p)
            dq = jnp.power(delta + eps, self.hc_q)
            fn_mag = jnp.maximum(
                0.0, (K * dp) * delta + (D * dq) * delta_dot
            )

            if flat:
                v_t = jnp.stack([pd[0], pd[1], zb])
                m_n = jnp.stack([zb, zb, mc[2]])
                m_t = jnp.stack([mc[0], mc[1], zb])
            else:
                v_t = jnp.stack(
                    [
                        pd[0] - ndotv * nax,
                        pd[1] - ndotv * nay,
                        pd[2] - ndotv * naz,
                    ]
                )
                mdotn = nax * mc[0] + nay * mc[1] + naz * mc[2]
                m_n = jnp.stack([mdotn * nax, mdotn * nay, mdotn * naz])
                m_t = mc - m_n

            f_t = -((K * dp) * m_t + (D * dq) * v_t)
            f_t_sq = jnp.sum(f_t * f_t, axis=0)
            sticking = jnp.logical_or(
                delta <= 0, f_t_sq <= (mu * fn_mag) ** 2
            )
            norm = jnp.sqrt(jnp.maximum(f_t_sq, eps**2))
            scale = jnp.minimum(mu * fn_mag, norm) / norm
            f_t = jnp.where(sticking, f_t, f_t * scale)
            f_t = jnp.where(delta <= 0, 0.0, f_t)

            md_nc = -(K / D) * mc
            md_st = v_t - (K / D) * m_n
            md_sl = -(f_t + (K * dp) * m_t) / (D * dq)
            status = sticking.astype(int) + (delta <= 0).astype(int)
            md = jnp.where(
                status == 0, md_sl, jnp.where(status == 1, md_st, md_nc)
            )
            md_list.append(md)

            if flat:
                f_lin = jnp.stack([f_t[0], f_t[1], f_t[2] + fn_mag])
            else:
                f_lin = jnp.stack(
                    [
                        f_t[0] + fn_mag * nax,
                        f_t[1] + fn_mag * nay,
                        f_t[2] + fn_mag * naz,
                    ]
                )
            f6 = jnp.concatenate([f_lin, _cross(pc, f_lin)])
            f_links[parent] = (
                f6 if f_links[parent] is None else f_links[parent] + f6
            )

        md_all = jnp.stack(md_list) if md_list else jnp.zeros_like(m)
        return f_links, md_all

    # ----- relaxed-rigid contacts -----

    @property
    def _rr_n_iter(self) -> int:
        if self.rr_iterations:
            return int(self.rr_iterations)
        if not self.n_points:
            return 0
        if self.terrain_kind != "plane":
            # Rough terrain mixes per-point contact normals, widening the
            # Delassus spectrum. With the round-5 conditioning work (the
            # MuJoCo-style impedance floor in the regularizer + the rrKc
            # block-Jacobi preconditioner) even 4 warm-started iterations
            # stay finite through the B=8192 Fourier-humanoid touchdown
            # that used to NaN at ≤16; 16 ships as the accuracy knee
            # (max|Δp| 5.2e-4 m vs the 64-iteration reference over 400
            # contact-rich steps, 13.5M env·steps/s — docs/ops.md table).
            return min(3 * self.n_points, 16)
        # Plane terrain, warm-started budget: the previous step's solution
        # is one O(dt) geometry move away, so a handful of PCG iterations
        # re-converges it (plus the one A-apply the warm-start residual
        # costs). The humanoid study (docs/ops.md) shows warm-started 8
        # iterations match the 148-iteration exact solve to ~1e-7 m.
        return min(self.n_points // 4 + 6, 8)

    def _minv_apply(self, fact, f_loc, bshape, pr):
        """Zero-velocity articulated substitution passes: link-frame spatial
        forces ``f_loc`` (list, None allowed) → link-frame accelerations +
        joint accelerations, i.e. the generalized M⁻¹ Jᵀ action reusing the
        configuration-only factorization from :meth:`aba` (``return_aux``).
        O(n) per application — Featherstone's ABA-as-M⁻¹ view, the same
        trick the reference uses in ``rbda/mass_inverse.py``."""
        nL = self.n_links
        zeros6 = jnp.zeros((6,) + bshape)
        pA = [
            (-f_loc[i]) if f_loc[i] is not None else zeros6 for i in range(nL)
        ]
        u = [None] * nL
        for i in range(nL - 1, 0, -1):
            lam = self.lam[i]
            S = pr["S"][i]
            if not _MOSAIC:
                u[i] = -jnp.einsum("i,i...->...", S, pA[i])
            else:
                u[i] = -sum(S[j] * pA[i][j] for j in range(6))
            pa = pA[i] + fact["U"][i] * (u[i] / fact["d"][i])
            if lam != 0 or self.floating_base:
                pA[lam] = pA[lam] + _xtf(fact["inv_R"][i], fact["inv_p"][i], pa)

        a = [None] * nL
        if self.floating_base:
            a[0] = -_chol6_substitute(fact["L0"], pA[0])
        else:
            a[0] = zeros6
        sdd = [None] * self.n_joints
        for i in range(1, nL):
            lam = self.lam[i]
            a_i = _xv(fact["inv_R"][i], fact["inv_p"][i], a[lam])
            if not _MOSAIC:
                sdd_i = (
                    u[i] - jnp.einsum("i...,i...->...", fact["U"][i], a_i)
                ) / fact["d"][i]
            else:
                sdd_i = (
                    u[i] - sum(fact["U"][i][j] * a_i[j] for j in range(6))
                ) / fact["d"][i]
            sdd[i - 1] = sdd_i
            a[i] = a_i + jnp.stack([pr["S"][i][k] * sdd_i for k in range(6)])
        sdd_out = jnp.stack(sdd) if sdd else jnp.zeros((0,) + bshape)
        return a, sdd_out

    # ----- weld kinematic constraints -----

    def _constraint_frame_geo(self, c, W_R, W_p, W_v, pr, bshape):
        """Per-frame world geometry of constraint ``c``: for each of the
        two welded frames, ``(parent, Rp, Lpfb, RF, pF, pdF, omega)``."""
        out = []
        for P, key in zip(self.constraint_parents[c], ("cH1", "cH2")):
            H = pr[key][c]
            Rp, pp, vp = W_R[P], W_p[P], W_v[P]
            Lpfb = _bvec(H[:3, 3], 3, bshape)
            RF = _mm(Rp, _bmat(H[:3, :3], 3, 3, bshape), 3)
            pF = _rv(Rp, Lpfb) + pp
            omega = vp[3:6]
            pdF = vp[0:3] + _cross(omega, pF)
            out.append((P, Rp, Lpfb, RF, pF, pdF, omega))
        return out

    def constraint_wrenches(self, state, W_R, W_p, W_v, f_ext, tau, pr):
        """Weld-constraint wrenches, trailing batch — the hot-path analog
        of ``ops/kinematic_constraints.compute_constraint_wrenches``
        (reference ``rbda/kinematic_constraints.py:19-345``): solve the
        regularized 6·nc Delassus system
        ``(J M⁻¹ Jᵀ + reg·I) x = −(Δa_F + K_D Δv_F + K_P e)`` in the
        world-oriented frame-origin (mixed) basis and return a per-link
        world 6D force list (torque about the world origin) to superpose
        on ``f_ext``.

        The Delassus matrix is assembled MATRIX-FREE — each of the 6·nc
        columns is one O(n) articulated substitution pass
        (:meth:`_minv_apply`) on a constraint-space basis wrench — then
        solved exactly with an unrolled Cholesky: no iterative loop, so
        plain reverse-mode AD works and Mosaic lowers it like any other
        elementwise graph (no custom_vjp needed). Two deliberate
        differences from the reference formulation: the rhs uses the TRUE
        frame acceleration difference (including the J̇ν bias — the
        textbook acceleration-level constraint; the reference's
        ``J ν̇_free`` drops the bias and leans on Baumgarte), and the
        rigid-contact impact projection does not see the weld (it acts on
        the velocity level for one instant; Baumgarte reabsorbs the
        residual)."""
        ncon = self.n_constraints
        nL = self.n_links
        bshape = state.p.shape[1:]
        N = 6 * ncon

        # Free dynamics GIVEN contact/actuation forces — constraints react
        # to them (generic-path ordering, ``api/ode.py:53-63``).
        _, _, fact = self.aba(
            state, W_R, W_p, W_v, f_ext, tau, pr, return_aux=True
        )
        a_free = fact["a"]

        geo = [
            self._constraint_frame_geo(c, W_R, W_p, W_v, pr, bshape)
            for c in range(ncon)
        ]

        # rhs: true frame acceleration difference + Baumgarte. The shared
        # gravity offset in a_free cancels in the F1 − F2 difference.
        b = []
        for c in range(ncon):
            (P1, Rp1, L1, RF1, pF1, pd1, w1) = geo[c][0]
            (P2, Rp2, L2, RF2, pF2, pd2, w2) = geo[c][1]
            kp, kd = self.constraint_kp[c], self.constraint_kd[c]
            acc = []
            for P, Rp, L, pd, w in (
                (P1, Rp1, L1, pd1, w1),
                (P2, Rp2, L2, pd2, w2),
            ):
                af = a_free[P]
                lin = _rv(Rp, af[0:3] + _cross(af[3:6], L)) + _cross(w, pd)
                ang = _rv(Rp, af[3:6])
                acc.append((lin, ang))
            e_lin = pF1 - pF2
            R_err = jnp.stack(
                [
                    jnp.stack(
                        [
                            sum(RF2[k, i] * RF1[k, j] for k in range(3))
                            for j in range(3)
                        ]
                    )
                    for i in range(3)
                ]
            )
            e_rot = _rot_log_vee(R_err)
            dv_lin, dv_ang = pd1 - pd2, w1 - w2
            da_lin = acc[0][0] - acc[1][0]
            da_ang = acc[0][1] - acc[1][1]
            for j in range(3):
                b.append(da_lin[j] + kd * dv_lin[j] + kp * e_lin[j])
            for j in range(3):
                b.append(da_ang[j] + kd * dv_ang[j] + kp * e_rot[j])

        # Assemble A = J M⁻¹ Jᵀ + reg·I column by column: basis wrench
        # e_k → link-frame forces on the two parents (±) → M⁻¹ → frame
        # acceleration readings. Rᵀe_j is just the j-th row of R, so the
        # scatter needs no one-hot vectors.
        A = [[None] * N for _ in range(N)]
        for cc in range(ncon):
            for jj in range(6):
                f_loc = [None] * nL
                for sign, (P, Rp, Lpfb, *_rest) in zip(
                    (1.0, -1.0), geo[cc]
                ):
                    row = jj if jj < 3 else jj - 3
                    Re = jnp.stack([Rp[row, 0], Rp[row, 1], Rp[row, 2]])
                    if jj < 3:  # unit world force at the frame origin
                        f6 = jnp.concatenate([Re, _cross(Lpfb, Re)])
                    else:  # unit world moment
                        f6 = jnp.concatenate([jnp.zeros_like(Re), Re])
                    f6 = sign * f6
                    f_loc[P] = f6 if f_loc[P] is None else f_loc[P] + f6
                a_c, _ = self._minv_apply(fact, f_loc, bshape, pr)
                col = []
                for c2 in range(ncon):
                    reads = []
                    for P, Rp, Lpfb, *_rest in geo[c2]:
                        ac = a_c[P]
                        reads.append(
                            (
                                _rv(Rp, ac[0:3] + _cross(ac[3:6], Lpfb)),
                                _rv(Rp, ac[3:6]),
                            )
                        )
                    d_lin = reads[0][0] - reads[1][0]
                    d_ang = reads[0][1] - reads[1][1]
                    col.extend([d_lin[j] for j in range(3)])
                    col.extend([d_ang[j] for j in range(3)])
                k = 6 * cc + jj
                for l in range(N):
                    A[l][k] = col[l]
        reg = self.constraint_reg
        for k in range(N):
            A[k][k] = A[k][k] + reg

        x = _choln_solve(A, [-bi for bi in b], N)

        # Equal/opposite world wrenches about the world origin.
        f_out = [None] * nL
        for c in range(ncon):
            f = jnp.stack([x[6 * c + j] for j in range(3)])
            m = jnp.stack([x[6 * c + 3 + j] for j in range(3)])
            for sign, (P, _Rp, _L, _RF, pF, *_r) in zip((1.0, -1.0), geo[c]):
                f6 = jnp.concatenate(
                    [sign * f, sign * (_cross(pF, f) + m)]
                )
                f_out[P] = f6 if f_out[P] is None else f_out[P] + f6
        return f_out

    def _with_constraint_forces(self, state, W_R, W_p, W_v, f_links, tau, pr):
        """``f_links`` plus the weld-constraint wrenches they induce."""
        f_con = self.constraint_wrenches(
            state, W_R, W_p, W_v, f_links, tau, pr
        )
        return [
            a if b is None else (b if a is None else a + b)
            for a, b in zip(f_links, f_con)
        ]

    def relaxed_rigid_contact_forces(
        self, state: BatchedState, W_R, W_p, W_v, tau, pr=None,
        return_accelerations: bool = False,
    ):
        """Relaxed-rigid (MJX-style soft-constraint) contact solve, trailing
        batch (reference ``rbda/contacts/relaxed_rigid.py:283-653`` /
        repo ``ops/contacts/relaxed_rigid.py``).

        The SPD system ``A x = −b`` with ``A = G + diag(r) + reg·I`` and
        ``G = J M⁻¹ Jᵀ`` (Delassus) is solved MATRIX-FREE with a fixed
        number of Jacobi-preconditioned CG iterations: each ``G·y``
        application scatters point forces to link-frame wrenches, runs the
        O(n) articulated substitution passes (:meth:`_minv_apply`, reusing
        the per-step factorization), and gathers point accelerations — all
        element-wise over the batch, Mosaic-lowerable, no gathers and no
        data-dependent loop bounds.

        Returns ``(f_links, accelerations, xs)`` where ``f_links`` are world
        6D contact forces per link, ``accelerations`` is ``(W_a, sdd)``
        of the full contact-coupled dynamics (superposition of the free
        ABA and ``M⁻¹ Jᵀ x`` — exact, since forces enter linearly) when
        ``return_accelerations`` else None, and ``xs`` is the ``(nC, 3,
        *b)`` solved point-force array (carried in ``state.m`` by the
        step so the next solve warm-starts from it).
        """
        pr = pr if pr is not None else self.params()
        bshape = state.p.shape[1:]
        nL, nC = self.n_links, self.n_points
        mu = self.mu
        width = self.rr_width
        mid, power = self.rr_midpoint, self.rr_power
        xi_min, xi_max = self.rr_d_min, self.rr_d_max
        reg = self.rr_reg
        zb = jnp.zeros(bshape)

        # Free dynamics (gravity + torques, no contacts) + factorization.
        f_none = [None] * nL
        W_a_free, sdd_free, fact = self.aba(
            state, W_R, W_p, W_v, f_none, tau, pr, return_aux=True
        )
        a_free = fact["a"]
        gzb = jnp.full(bshape, self.gravity_z)
        if "gmul" in pr:
            gzb = gzb * pr["gmul"]

        # Per-point constraint data (geometry shared with the rigid path —
        # handles plane AND rough {fourier, heightmap} terrain kinds with
        # per-point batch-shaped normals).
        geo = self._point_geometry(W_R, W_p, W_v, pr, bshape)
        pc_l, act_l, b_l, prec_l, rdiag_l, Lpb_l, Rp_l = [], [], [], [], [], [], []
        for c in range(nC):
            g = geo[c]
            parent = g["parent"]
            Rp, Lpb = g["Rp"], g["Lpb"]
            pc, pd, omega = g["pc"], g["pd"], g["omega"]
            delta, active = g["delta"], g["active"]

            # Impedance ξ per component of pos = −δ n̂ (elementwise sigmoid,
            # reference ``relaxed_rigid.py:525-653``).
            n_hat = g["n"] if g["n"] is not None else (0.0, 0.0, 1.0)
            xi, aref, coeff = [], [], []
            for j in range(3):
                pos_j = -delta * n_hat[j]
                x_j = delta * abs(n_hat[j]) / width
                ya = (1.0 / mid ** (power - 1.0)) * jnp.power(x_j, power)
                yb = 1.0 - (1.0 / (1.0 - mid) ** (power - 1.0)) * jnp.power(
                    jnp.clip(1.0 - x_j, 0.0, None), power
                )
                y_j = jnp.where(x_j < mid, ya, yb)
                xi_j = jnp.clip(
                    xi_min + y_j * (xi_max - xi_min), xi_min, xi_max
                )
                xi_j = jnp.where(x_j > 1.0, xi_max, xi_j)
                xi.append(xi_j)
                aref.append(
                    -(self.rr_damp * pd[j] + self.rr_stiff * xi_j * pos_j)
                )
                coeff.append(
                    (2.0 * mu * mu * (1.0 - xi_j) / (xi_j + 1e-12))
                    * (1.0 + mu * mu)
                )

            # Free point acceleration: p̈ = R(a_lin + ω̇×Lp) + g + ω×ṗ
            # (true world second derivative; equals Jl ν̇_free + J̇l ν).
            af = a_free[parent]
            acc = _rv(Rp, af[0:3] + _cross(af[3:6], Lpb))
            wxpd = _cross(omega, pd)
            pdd = jnp.stack(
                [acc[0] + wxpd[0], acc[1] + wxpd[1], acc[2] + gzb + wxpd[2]]
            )

            Minv = pr["rrMinv"][c]
            b_c, prec_c, r_c = [], [], []
            for j in range(3):
                # Reference μ²-scaled regularizer PLUS the MuJoCo-style
                # impedance floor (1−ξ)/ξ · M⁻¹_jj — identical to the
                # generic path (``ops/contacts/relaxed_rigid.py``
                # _regularizers): without the floor, near-null Delassus
                # directions (co-planar points on one link) are
                # regularized only by ``reg`` and the solve trades huge
                # equal-and-opposite forces that destabilize deep
                # touchdowns.
                r_j = active * (
                    sum(coeff[i] * Minv[i, j] for i in range(3))
                    + ((1.0 - xi[j]) / (xi[j] + 1e-12)) * Minv[j, j]
                )
                r_c.append(r_j)
                b_c.append(active * (pdd[j] - aref[j]))
                prec_c.append(active * Minv[j, j] + r_j + reg)
            pc_l.append(pc)
            act_l.append(active)
            b_l.append(b_c)
            prec_l.append(prec_c)
            rdiag_l.append(r_c)
            Lpb_l.append(Lpb)
            Rp_l.append(Rp)

        def stack_cj(lists):
            return jnp.stack(
                [jnp.stack([lists[c][j] for j in range(3)]) for c in range(nC)]
            )

        def unstack_cj(arr):
            return [[arr[c, j] for j in range(3)] for c in range(nC)]

        # Everything the A-operator reads, as an explicit pytree so the
        # implicit-differentiation custom_vjp below sees it as an input
        # (closures over tracers would be invalid inside custom_vjp).
        ops = dict(
            act=list(act_l),
            Rp=list(Rp_l),
            Lpb=list(Lpb_l),
            rdiag=[list(r) for r in rdiag_l],
            fact=fact,
            pr=pr,
        )

        def A_apply_ops(o, y):
            """A y = G y + (r + reg) y, matrix-free from the ops pytree."""
            f_loc = [None] * nL
            for c in range(nC):
                parent = self.contact_parent[c]
                yc = jnp.stack([o["act"][c] * y[c][j] for j in range(3)])
                Rty = _rtv(o["Rp"][c], yc)
                f6 = jnp.concatenate([Rty, _cross(o["Lpb"][c], Rty)])
                f_loc[parent] = (
                    f6 if f_loc[parent] is None else f_loc[parent] + f6
                )
            a_c, _ = self._minv_apply(o["fact"], f_loc, bshape, o["pr"])
            out = []
            for c in range(nC):
                parent = self.contact_parent[c]
                ac = a_c[parent]
                acc = _rv(o["Rp"][c], ac[0:3] + _cross(ac[3:6], o["Lpb"][c]))
                out.append(
                    [
                        o["act"][c] * acc[j]
                        + (o["rdiag"][c][j] + reg) * y[c][j]
                        for j in range(3)
                    ]
                )
            return out

        # Preconditioned CG on A x = −b, fixed iteration count. The loop
        # body runs under fori_loop/scan so the (large) G-apply graph is
        # traced ONCE — unrolling it made XLA/Mosaic compiles intractable
        # for many-point models.
        #
        # Preconditioner: scalar Jacobi (1/m diagonal) on plane terrain;
        # BLOCK-Jacobi on rough terrain, where mixed per-point normals
        # widen the Delassus spectrum — the 3×3 blocks are the true
        # nominal articulated compliances (``rrKc``, see
        # :meth:`_nominal_delassus_blocks`) plus the impedance diagonal,
        # inverted in closed form per point. Halves the stable iteration
        # budget at touchdown (docs/ops.md rough-terrain study).
        neg_b = stack_cj(
            [[-b_l[c][j] for j in range(3)] for c in range(nC)]
        )
        n_iter = self._rr_n_iter
        use_block = "rrKc" in pr

        if use_block:

            def prec_apply(P, r_arr):
                return jnp.stack(
                    [
                        jnp.stack(
                            [
                                sum(
                                    P[c, i, j] * r_arr[c, j]
                                    for j in range(3)
                                )
                                for i in range(3)
                            ]
                        )
                        for c in range(nC)
                    ]
                )

        else:

            def prec_apply(P, r_arr):
                return r_arr / P

        def pcg_run(b_arr, o, prec, x0=None):
            if x0 is None:
                x_init = jnp.zeros_like(b_arr)
                r0 = b_arr
            else:
                # Warm start: one extra A-apply buys a near-converged
                # initial residual on rollouts (geometry moves O(dt)/step).
                x_init = x0
                r0 = b_arr - stack_cj(A_apply_ops(o, unstack_cj(x0)))
            z0 = prec_apply(prec, r0)
            carry0 = (
                x_init,
                r0,
                z0,
                jnp.sum(r0 * z0, axis=(0, 1)),
            )

            def cg_step(carry, _):
                xs, rs, ps, rz = carry
                Ap = stack_cj(A_apply_ops(o, unstack_cj(ps)))
                alpha = rz / (jnp.sum(ps * Ap, axis=(0, 1)) + 1e-20)
                xs = xs + alpha * ps
                rs = rs - alpha * Ap
                zs = prec_apply(prec, rs)
                rz_n = jnp.sum(rs * zs, axis=(0, 1))
                beta = rz_n / (rz + 1e-20)
                return (xs, rs, zs + beta * ps, rz_n), None

            if _MOSAIC:
                # Mosaic lowers only fori_loop-shaped loops (its scan rule
                # rejects general carries); reverse-AD of this loop is
                # never requested — the custom_vjp below owns the backward.
                xs, _, _, _ = jax.lax.fori_loop(
                    0, n_iter, lambda k, c: cg_step(c, None)[0], carry0
                )
            else:
                (xs, _, _, _), _ = jax.lax.scan(
                    cg_step, carry0, None, length=n_iter
                )
            return xs

        # Implicit differentiation of the solve (hand-written VJP, SURVEY
        # §7 "reverse-mode AD through custom Pallas kernels"): reverse-mode
        # through the unrolled PCG amplifies the 1/prec Jacobi divisions
        # (prec = reg = 1e-6 on inactive points) into NaN, and Mosaic
        # cannot lower a reversed loop at all. For x = A(θ)⁻¹ b the VJP is
        # λ = A⁻¹ x̄ (one more PCG on the same SPD operator), b̄ = λ,
        # θ̄ = ∂⟨−λ, A(θ) x⟩/∂θ (plain elementwise vjp) — every piece is a
        # forward fori_loop or elementwise math, so jax.vjp of the step
        # works both under XLA and when traced INSIDE a Pallas kernel.
        @jax.custom_vjp
        def pcg_implicit(b_arr, o, prec, x0):
            return pcg_run(b_arr, o, prec, x0)

        def pcg_fwd(b_arr, o, prec, x0):
            x_arr = pcg_run(b_arr, o, prec, x0)
            return x_arr, (x_arr, o, prec)

        def pcg_bwd(res, x_bar):
            x_arr, o, prec = res
            lam = pcg_run(x_bar, o, prec)
            _, vjp_ops = jax.vjp(
                lambda oo: stack_cj(A_apply_ops(oo, unstack_cj(x_arr))), o
            )
            (o_bar,) = vjp_ops(-lam)
            # prec and the warm start x0 are solver details: at convergence
            # they do not move the solution, so their implicit cotangents
            # are zero.
            return lam, o_bar, jnp.zeros_like(prec), jnp.zeros_like(x_arr)

        pcg_implicit.defvjp(pcg_fwd, pcg_bwd)

        # Warm start from the previous step's forces (threaded through the
        # otherwise-unused ``m`` state slot, same as the rigid APGD), masked
        # to the currently active points. A FRESH contact has no carried
        # force (m = 0): seed it with the Jacobi estimate x ≈ −b / diag(A)
        # instead — the decoupled per-point solution, the same idea as the
        # reference's Hunt/Crossley warm start (``relaxed_rigid.py:467-481``).
        # Touchdown transients are exactly where the tight warm-started
        # iteration budget otherwise under-converges (observed as a full
        # batch NaN blowup on rough terrain within ~20 steps of first
        # contact, docs/ops.md).
        if use_block:
            # P_c = act·K_c + diag(r_c) + reg·I, inverted in closed form
            # (symmetric 3×3 adjugate/determinant — elementwise over the
            # batch, Mosaic-lowerable; SPD by construction so det > 0).
            Pinv_rows = []
            for c in range(nC):
                Kc = pr["rrKc"][c]
                act = act_l[c]
                r_c = rdiag_l[c]
                m00 = act * Kc[0, 0] + r_c[0] + reg
                m11 = act * Kc[1, 1] + r_c[1] + reg
                m22 = act * Kc[2, 2] + r_c[2] + reg
                m01 = act * Kc[0, 1]
                m02 = act * Kc[0, 2]
                m12 = act * Kc[1, 2]
                c00 = m11 * m22 - m12 * m12
                c01 = m02 * m12 - m01 * m22
                c02 = m01 * m12 - m02 * m11
                c11 = m00 * m22 - m02 * m02
                c12 = m01 * m02 - m00 * m12
                c22 = m00 * m11 - m01 * m01
                inv_det = 1.0 / (m00 * c00 + m01 * c01 + m02 * c02)
                Pinv_rows.append(
                    jnp.stack(
                        [
                            jnp.stack([c00, c01, c02]),
                            jnp.stack([c01, c11, c12]),
                            jnp.stack([c02, c12, c22]),
                        ]
                    )
                    * inv_det
                )
            prec_arr = jnp.stack(Pinv_rows)
        else:
            prec_arr = stack_cj(prec_l)
        m_carried = jnp.stack(
            [
                jnp.stack([act_l[c] * state.m[c, j] for j in range(3)])
                for c in range(nC)
            ]
        )
        has_warm = jnp.sum(m_carried * m_carried, axis=1, keepdims=True) > 0.0
        x0 = jnp.where(has_warm, m_carried, prec_apply(prec_arr, neg_b))
        xs = pcg_implicit(neg_b, ops, prec_arr, x0)
        x = unstack_cj(xs)

        # World contact wrenches per link.
        f_links = [None] * nL
        f_loc = [None] * nL
        for c in range(nC):
            parent = self.contact_parent[c]
            xc = jnp.stack([x[c][0], x[c][1], x[c][2]])
            f6 = jnp.concatenate([xc, _cross(pc_l[c], xc)])
            f_links[parent] = (
                f6 if f_links[parent] is None else f_links[parent] + f6
            )
            Rtx = _rtv(Rp_l[c], xc)
            f6_loc = jnp.concatenate([Rtx, _cross(Lpb_l[c], Rtx)])
            f_loc[parent] = (
                f6_loc if f_loc[parent] is None else f_loc[parent] + f6_loc
            )

        if not return_accelerations:
            return f_links, None, xs

        a_cont, sdd_cont = self._minv_apply(fact, f_loc, bshape, pr)
        if self.floating_base:
            a0 = a_free[0] + a_cont[0]
            zb6 = jnp.stack([zb, zb, gzb, zb, zb, zb])
            W_a = _xv(W_R[0], W_p[0], a0) + zb6
        else:
            W_a = jnp.zeros((6,) + bshape)
        return f_links, (W_a, sdd_free + sdd_cont), xs

    # ----- rigid contacts (acceleration-level QP, matrix-free APGD) -----

    @property
    def _rigid_n_iter(self) -> int:
        if self.rigid_iterations:
            return int(self.rigid_iterations)
        # Warm-started budget (previous step's cone-projected forces are
        # the initial iterate): a third of the cold-start count tracks the
        # 96-iteration reference to ~4e-5 m over 500-step humanoid
        # rollouts (docs/ops.md accuracy table).
        return min(self.n_points // 3 + 6, 16) if self.n_points else 0

    @property
    def _rigid_impact_n_iter(self) -> int:
        if self.rigid_impact_iterations:
            return int(self.rigid_impact_iterations)
        # 8 is bit-identical to 12 on the humanoid study — the active-set
        # impulse system is far better conditioned than the force QP.
        return min(self.n_points // 4 + 4, 8) if self.n_points else 0

    @property
    def _rigid_bwd_n_iter(self) -> int:
        if self.rigid_bwd_iterations:
            return int(self.rigid_bwd_iterations)
        return max(64, 3 * self._rigid_n_iter)

    def _rigid_geo_like(self, o):
        """Rebuild the minimal per-point geometry list _delassus_apply
        expects from an explicit ops pytree (custom_vjp functions may not
        close over tracers, so the operator inputs travel as arguments)."""
        return [
            dict(
                parent=self.contact_parent[c],
                active=o["act"][c],
                Rp=o["Rp"][c],
                Lpb=o["Lpb"][c],
            )
            for c in range(self.n_points)
        ]

    def _point_geometry(self, W_R, W_p, W_v, pr, bshape):
        """Per-point world position / velocity / penetration / activity and
        the scatter/gather payloads shared by every matrix-free Delassus
        application (same geometry as the relaxed-rigid path)."""
        ax, ay, az = self.terrain_normal
        off = self.terrain_offset
        rough = self.terrain_kind in ("fourier", "heightmap")
        flat = (ax, ay, az) == (0.0, 0.0, 1.0) and off == 0.0 and not rough
        geo = []
        for c in range(self.n_points):
            parent = self.contact_parent[c]
            Lpb = _bvec(pr["cpoint"][c], 3, bshape)
            Rp, pp, vp = W_R[parent], W_p[parent], W_v[parent]
            pc = _rv(Rp, Lpb) + pp
            omega = vp[3:6]
            pd = vp[0:3] + _cross(omega, pc)
            if flat:
                delta = jnp.maximum(0.0, -pc[2])
                delta_dot = -pd[2]
                n = None  # world-z cone fast path
            elif rough:
                # Per-point, batch-shaped terrain normal from the analytic
                # (Fourier) or bilinear (heightmap) surface gradient.
                h, dhx, dhy = self._terrain_height_grad(pr, pc[0], pc[1])
                inv_n = 1.0 / jnp.sqrt(dhx * dhx + dhy * dhy + 1.0)
                n = (-dhx * inv_n, -dhy * inv_n, inv_n)
                delta = jnp.maximum(0.0, (h - pc[2]) * n[2])
                delta_dot = -(n[0] * pd[0] + n[1] * pd[1] + n[2] * pd[2])
            else:
                ndotp = ax * pc[0] + ay * pc[1] + az * pc[2]
                delta = jnp.maximum(0.0, off - ndotp)
                delta_dot = -(ax * pd[0] + ay * pd[1] + az * pd[2])
                n = (ax, ay, az)
            active = (delta > 0).astype(pc.dtype)
            geo.append(
                dict(
                    parent=parent, Lpb=Lpb, Rp=Rp, pc=pc, pd=pd, omega=omega,
                    delta=delta, delta_dot=delta_dot, active=active, n=n,
                )
            )
        return geo

    def _delassus_apply(self, fact, geo, y, bshape, pr, reg):
        """(G + reg·I) y, matrix-free: scatter masked point forces to local
        link wrenches, one M⁻¹ substitution pass, gather world point linear
        accelerations (exactly the relaxed-rigid A-apply minus its diagonal
        impedance term)."""
        nL, nC = self.n_links, self.n_points
        f_loc = [None] * nL
        for c in range(nC):
            g = geo[c]
            yc = jnp.stack([g["active"] * y[c][j] for j in range(3)])
            Rty = _rtv(g["Rp"], yc)
            f6 = jnp.concatenate([Rty, _cross(g["Lpb"], Rty)])
            p = g["parent"]
            f_loc[p] = f6 if f_loc[p] is None else f_loc[p] + f6
        a_c, _ = self._minv_apply(fact, f_loc, bshape, pr)
        out = []
        for c in range(nC):
            g = geo[c]
            ac = a_c[g["parent"]]
            acc = _rv(g["Rp"], ac[0:3] + _cross(ac[3:6], g["Lpb"]))
            out.append(
                [g["active"] * acc[j] + reg * y[c][j] for j in range(3)]
            )
        return out

    @staticmethod
    def _project_friction_cone(p, mu, active, n=None):
        """Moreau projection of a 3D world point force onto the friction
        cone {‖f_t‖ ≤ μ f_n, f_n ≥ 0} about the contact normal, zeroed for
        inactive points. The reference linearizes the cone into a pyramid
        because its qpax QP needs linear constraints
        (``rbda/contacts/rigid.py:474-500``); the projection operator
        handles the exact cone, which is both cheaper (elementwise) and
        physically isotropic.

        ``n=None`` is the flat-ground fast path (normal = ẑ). Otherwise
        ``n`` is a 3-tuple (static floats for an inclined plane,
        batch-shaped arrays for rough terrain): the force is rotated into
        the contact frame with the minimal rotation taking ẑ → n̂
        (elementwise Rodrigues; n̂_z > 0 for any walkable terrain keeps it
        well-conditioned), projected, and rotated back."""

        def project_z(px, py, pn):
            ft = jnp.sqrt(px * px + py * py + 1e-24)
            in_cone = ft <= mu * pn
            in_polar = mu * ft <= -pn
            fn_b = (mu * ft + pn) / (1.0 + mu * mu)
            scale = mu * fn_b / ft
            fx = jnp.where(in_cone, px, jnp.where(in_polar, 0.0, px * scale))
            fy = jnp.where(in_cone, py, jnp.where(in_polar, 0.0, py * scale))
            fz = jnp.where(in_cone, pn, jnp.where(in_polar, 0.0, fn_b))
            return fx, fy, fz

        static_n = n is not None and all(isinstance(v, float) for v in n)
        if n is None or (static_n and n == (0.0, 0.0, 1.0)):
            fx, fy, fz = project_z(p[0], p[1], p[2])
            return [active * fx, active * fy, active * fz]

        nx, ny, nz = n
        d = 1.0 / (1.0 + nz)
        # R maps ẑ → n̂ (third column = n̂); local = Rᵀ p, world = R local.
        lx = (1.0 - nx * nx * d) * p[0] - nx * ny * d * p[1] - nx * p[2]
        ly = -nx * ny * d * p[0] + (1.0 - ny * ny * d) * p[1] - ny * p[2]
        ln = nx * p[0] + ny * p[1] + nz * p[2]
        qx, qy, qn = project_z(lx, ly, ln)
        fx = (1.0 - nx * nx * d) * qx - nx * ny * d * qy + nx * qn
        fy = -nx * ny * d * qx + (1.0 - ny * ny * d) * qy + ny * qn
        fz = -nx * qx - ny * qy + nz * qn
        return [active * fx, active * fy, active * fz]

    def rigid_contact_forces(
        self, state: BatchedState, W_R, W_p, W_v, tau, pr=None,
        return_accelerations: bool = False,
    ):
        """Acceleration-level rigid contact solve, trailing batch (reference
        ``rbda/contacts/rigid.py:283-539`` / repo ``ops/contacts/rigid.py``).

        Solves the same QP as the generic path — minimize
        ``½ xᵀ(G + εI)x + xᵀ(p̈_free − baumgarte)`` over feasible point
        forces — but MATRIX-FREE and cone-constrained: accelerated
        projected gradient descent (APGD/FISTA) whose gradient step applies
        the Delassus operator via the O(n) articulated substitution passes
        and whose projection is the exact friction-cone projection (the
        generic path's ADMM uses the pyramid linearization instead). The
        Lipschitz constant comes from a short power iteration on the same
        operator. Everything is elementwise over the batch tiles and
        Mosaic-lowerable (fori_loop in kernels, lax.scan under XLA for
        reverse-mode AD)."""
        pr = pr if pr is not None else self.params()
        bshape = state.p.shape[1:]
        nL, nC = self.n_links, self.n_points
        reg = self.rigid_reg
        mu = self.mu
        zb = jnp.zeros(bshape)

        f_none = [None] * nL
        W_a_free, sdd_free, fact = self.aba(
            state, W_R, W_p, W_v, f_none, tau, pr, return_aux=True
        )
        a_free = fact["a"]
        gzb = jnp.full(bshape, self.gravity_z)
        if "gmul" in pr:
            gzb = gzb * pr["gmul"]

        geo = self._point_geometry(W_R, W_p, W_v, pr, bshape)

        # q = free point acceleration − Baumgarte (active points only).
        q_l = []
        for c in range(nC):
            g = geo[c]
            af = a_free[g["parent"]]
            acc = _rv(g["Rp"], af[0:3] + _cross(af[3:6], g["Lpb"]))
            wxpd = _cross(g["omega"], g["pd"])
            pdd = [acc[0] + wxpd[0], acc[1] + wxpd[1], acc[2] + gzb + wxpd[2]]
            bg = self.K * g["delta"] + self.D * g["delta_dot"]
            n_hat = g["n"] if g["n"] is not None else (0.0, 0.0, 1.0)
            q_l.append(
                [g["active"] * (pdd[j] - bg * n_hat[j]) for j in range(3)]
            )

        def stack_cj(lists):
            return jnp.stack(
                [jnp.stack([lists[c][j] for j in range(3)]) for c in range(nC)]
            )

        def unstack_cj(arr):
            return [[arr[c, j] for j in range(3)] for c in range(nC)]

        def dot(xs, ys):
            return sum(
                xs[c][j] * ys[c][j] for c in range(nC) for j in range(3)
            )

        # Everything the solve reads, as an explicit pytree: the implicit
        # custom_vjp below must take the operator inputs as ARGUMENTS (no
        # closures over tracers inside custom_vjp functions).
        ops = dict(
            act=[geo[c]["active"] for c in range(nC)],
            Rp=[geo[c]["Rp"] for c in range(nC)],
            Lpb=[geo[c]["Lpb"] for c in range(nC)],
            q=[list(q_l[c]) for c in range(nC)],
            # Per-point contact normals for the cone projection (None =
            # flat ground; batch-shaped tracers for rough terrain must
            # travel through the ops pytree, not closures).
            nrm=[geo[c]["n"] for c in range(nC)],
            fact=fact,
            pr=pr,
        )

        def A_ops(o, y):
            return self._delassus_apply(
                o["fact"], self._rigid_geo_like(o), y, bshape, o["pr"], reg
            )

        # Lipschitz bound: power iteration on (G + reg I). Start from the
        # (deterministic) all-ones direction; the safety factor covers the
        # from-below convergence of a short run (an overestimate only slows
        # APGD slightly; an underestimate diverges). Gradients are stopped
        # on BOTH sides of this loop: the exact fixed point is step-size
        # independent (x = Π(x − γ∇) has the same solutions for every
        # γ > 0), so L carries no implicit cotangent — and input-side
        # stop_gradient keeps jax.vjp of the step from LINEARIZING the
        # loop at all. Output-only stop_gradient is not enough: the
        # linearized scan stacks every body intermediate as a residual
        # output (768 outvars for garpez), which Mosaic's scan rule cannot
        # lower — the round-5 on-chip run of the fused rigid BACKWARD
        # kernel failed exactly there ("foreach() argument 2 is shorter").
        ops_sg = jax.tree.map(
            lambda a: jax.lax.stop_gradient(a) if a is not None else None,
            ops,
        )
        v0 = jnp.ones((nC, 3) + bshape)
        v0 = v0 / jnp.sqrt(jnp.asarray(3.0 * nC))

        def power_step(carry, _):
            v, lam = carry
            Av = stack_cj(A_ops(ops_sg, unstack_cj(v)))
            lam = jnp.sqrt(
                jnp.maximum(jnp.sum(Av * Av, axis=(0, 1)), 1e-12)
            )
            return (Av / lam, lam), None

        n_pow = int(self.rigid_power_iterations)
        if _MOSAIC:
            (_, lam_max) = jax.lax.fori_loop(
                0, n_pow, lambda k, c: power_step(c, None)[0],
                (v0, jnp.ones(bshape)),
            )
        else:
            (_, lam_max), _ = jax.lax.scan(
                power_step, (v0, jnp.ones(bshape)), None, length=n_pow
            )
        L = jax.lax.stop_gradient(self.rigid_power_safety * lam_max + reg)

        # APGD / FISTA with fixed iteration count, warm-started from the
        # previous step's forces (carried in ``state.m``, which is unused
        # by the rigid model otherwise): geometry moves O(dt) per step, so
        # the cone-projection of the previous solution is an excellent
        # initial iterate and steady-state contacts converge in a few
        # iterations. First step after ``init_state``/``state_from_data``
        # has m = 0 = the cold start.
        x0 = stack_cj(
            [
                self._project_friction_cone(
                    [state.m[c, 0], state.m[c, 1], state.m[c, 2]],
                    mu,
                    geo[c]["active"],
                    geo[c]["n"],
                )
                for c in range(nC)
            ]
        )
        n_fwd, n_bwd = self._rigid_n_iter, self._rigid_bwd_n_iter

        def fista_run(x0_arr, o, Lc):
            carry0 = (x0_arr, x0_arr, jnp.ones(bshape))

            def apgd_step(carry, _):
                xs_c, ys, t = carry
                grad = A_ops(o, unstack_cj(ys))
                x_n = []
                for c in range(nC):
                    p = [
                        ys[c, j] - (grad[c][j] + o["q"][c][j]) / Lc
                        for j in range(3)
                    ]
                    x_n.append(
                        self._project_friction_cone(
                            p, mu, o["act"][c], o["nrm"][c]
                        )
                    )
                t_n = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
                beta = (t - 1.0) / t_n
                xs_n = stack_cj(x_n)
                ys_n = xs_n + beta * (xs_n - xs_c)
                return (xs_n, ys_n, t_n), None

            if _MOSAIC:
                xs_c, _, _ = jax.lax.fori_loop(
                    0, n_fwd, lambda k, c: apgd_step(c, None)[0], carry0
                )
            else:
                (xs_c, _, _), _ = jax.lax.scan(
                    apgd_step, carry0, None, length=n_fwd
                )
            return xs_c

        def pgd_map(o, x_arr, Lc):
            """One UNaccelerated projected-gradient step T(x) — the APGD
            limit is a fixed point of T, which is what the implicit VJP
            linearizes."""
            Ax = A_ops(o, unstack_cj(x_arr))
            out = []
            for c in range(nC):
                p = [
                    x_arr[c, j] - (Ax[c][j] + o["q"][c][j]) / Lc
                    for j in range(3)
                ]
                out.append(
                self._project_friction_cone(p, mu, o["act"][c], o["nrm"][c])
            )
            return stack_cj(out)

        # Implicit differentiation of the cone-projected fixed point
        # x* = T(x*, θ), T = Π_cone ∘ (I − (A(θ)· + q(θ))/L): the VJP is
        # θ̄ = T_θᵀ λ with λ = (I − T_xᵀ)⁻¹ x̄ summed by the Neumann series
        # λ ← x̄ + T_xᵀ λ (‖T_x‖ < 1 since Π is 1-Lipschitz and
        # ‖I − A/L‖ < 1). Every piece is a forward loop + elementwise vjps
        # of ONE application of T, so jax.vjp of the step traces under
        # Mosaic inside the fused backward kernel (reversing the unrolled
        # FISTA scan would both NaN — near-singular masked coordinates —
        # and fail to lower). Warm start x0 and step size L are solver
        # details of the converged fixed point: zero cotangents.
        @jax.custom_vjp
        def apgd_implicit(x0_arr, o, Lc):
            return fista_run(x0_arr, o, Lc)

        def apgd_fwd(x0_arr, o, Lc):
            xs_c = fista_run(x0_arr, o, Lc)
            return xs_c, (xs_c, o, Lc)

        def apgd_bwd(res, x_bar):
            xs_c, o, Lc = res
            _, vjp_x = jax.vjp(lambda xx: pgd_map(o, xx, Lc), xs_c)

            def neum_step(lam):
                return x_bar + vjp_x(lam)[0]

            if _MOSAIC:
                lam = jax.lax.fori_loop(
                    0, n_bwd, lambda k, l: neum_step(l), x_bar
                )
            else:
                lam, _ = jax.lax.scan(
                    lambda l, _: (neum_step(l), None),
                    x_bar,
                    None,
                    length=n_bwd,
                )
            _, vjp_o = jax.vjp(lambda oo: pgd_map(oo, xs_c, Lc), o)
            (o_bar,) = vjp_o(lam)
            return jnp.zeros_like(xs_c), o_bar, jnp.zeros_like(Lc)

        apgd_implicit.defvjp(apgd_fwd, apgd_bwd)

        xs = apgd_implicit(x0, ops, L)
        x = unstack_cj(xs)

        f_links = [None] * nL
        f_loc = [None] * nL
        for c in range(nC):
            g = geo[c]
            xc = jnp.stack([g["active"] * x[c][j] for j in range(3)])
            f6 = jnp.concatenate([xc, _cross(g["pc"], xc)])
            p = g["parent"]
            f_links[p] = f6 if f_links[p] is None else f_links[p] + f6
            Rtx = _rtv(g["Rp"], xc)
            f6_loc = jnp.concatenate([Rtx, _cross(g["Lpb"], Rtx)])
            f_loc[p] = f6_loc if f_loc[p] is None else f_loc[p] + f6_loc

        if not return_accelerations:
            return f_links, None, xs

        a_cont, sdd_cont = self._minv_apply(fact, f_loc, bshape, pr)
        if self.floating_base:
            a0 = a_free[0] + a_cont[0]
            zb6 = jnp.stack([zb, zb, gzb, zb, zb, zb])
            W_a = _xv(W_R[0], W_p[0], a0) + zb6
        else:
            W_a = jnp.zeros((6,) + bshape)
        return f_links, (W_a, sdd_free + sdd_cont), xs

    def rigid_impact_projection(self, state: BatchedState, pr=None) -> BatchedState:
        """Post-integration velocity projection (reference
        ``rbda/contacts/rigid.py:381-443`` KKT least-squares): active points
        get zero world linear velocity by solving ``G λ = Jl ν`` on the
        active set (masked Jacobi-free CG on the regularized Delassus) and
        applying ``ν ← ν − M⁻¹ Jlᵀ λ``. Inelastic impact — removes the
        kinetic energy of penetration-ward motion at touchdown."""
        pr = pr if pr is not None else self.params()
        bshape = state.p.shape[1:]
        nL, nC = self.n_links, self.n_points
        if nC == 0:
            return state
        reg = self.rigid_reg

        W_R, W_p, W_v = self.fk(state, pr)
        f_none = [None] * nL
        _, _, fact = self.aba(
            state, W_R, W_p, W_v, f_none,
            jnp.zeros((self.n_joints,) + bshape), pr, return_aux=True,
        )
        geo = self._point_geometry(W_R, W_p, W_v, pr, bshape)

        def stack_cj(lists):
            return jnp.stack(
                [jnp.stack([lists[c][j] for j in range(3)]) for c in range(nC)]
            )

        def unstack_cj(arr):
            return [[arr[c, j] for j in range(3)] for c in range(nC)]

        b_arr = stack_cj(
            [
                [geo[c]["active"] * geo[c]["pd"][j] for j in range(3)]
                for c in range(nC)
            ]
        )

        ops = dict(
            act=[geo[c]["active"] for c in range(nC)],
            Rp=[geo[c]["Rp"] for c in range(nC)],
            Lpb=[geo[c]["Lpb"] for c in range(nC)],
            fact=fact,
            pr=pr,
        )

        n_iter = self._rigid_impact_n_iter

        def cg_run(b, o):
            def mv(y_arr):
                return stack_cj(
                    self._delassus_apply(
                        o["fact"],
                        self._rigid_geo_like(o),
                        unstack_cj(y_arr),
                        bshape,
                        o["pr"],
                        reg,
                    )
                )

            carry0 = (jnp.zeros_like(b), b, b, jnp.sum(b * b, axis=(0, 1)))

            def cg_step(carry, _):
                xs, rs, ps, rr_ = carry
                Ap = mv(ps)
                alpha = rr_ / (jnp.sum(ps * Ap, axis=(0, 1)) + 1e-20)
                xs = xs + alpha * ps
                rs = rs - alpha * Ap
                rr_n = jnp.sum(rs * rs, axis=(0, 1))
                beta = rr_n / (rr_ + 1e-20)
                return (xs, rs, rs + beta * ps, rr_n), None

            if _MOSAIC:
                xs, _, _, _ = jax.lax.fori_loop(
                    0, n_iter, lambda k, c: cg_step(c, None)[0], carry0
                )
            else:
                (xs, _, _, _), _ = jax.lax.scan(
                    cg_step, carry0, None, length=n_iter
                )
            return xs

        # Implicit differentiation (hand-written VJP, same pattern as the
        # relaxed-rigid PCG): reverse-mode through an unrolled near-singular
        # CG (the Delassus on the active set is rank-deficient, reg is
        # tiny) explodes to NaN and Mosaic cannot reverse a loop at all.
        # For x = A(θ)⁻¹ b: λ = A⁻¹ x̄ (one more CG on the same SPD
        # operator), b̄ = λ, θ̄ = ∂⟨−λ, A(θ) x⟩/∂θ — forward loops and
        # elementwise vjps only, so the fused Pallas backward kernel
        # traces it for rigid engines too.
        @jax.custom_vjp
        def cg_implicit(b, o):
            return cg_run(b, o)

        def cg_fwd(b, o):
            x_arr = cg_run(b, o)
            return x_arr, (x_arr, o)

        def cg_bwd(res, x_bar):
            x_arr, o = res
            lam_ = cg_run(x_bar, o)
            _, vjp_o = jax.vjp(
                lambda oo: stack_cj(
                    self._delassus_apply(
                        oo["fact"],
                        self._rigid_geo_like(oo),
                        unstack_cj(x_arr),
                        bshape,
                        oo["pr"],
                        reg,
                    )
                ),
                o,
            )
            (o_bar,) = vjp_o(-lam_)
            return lam_, o_bar

        cg_implicit.defvjp(cg_fwd, cg_bwd)

        xs = cg_implicit(b_arr, ops)
        lam = unstack_cj(xs)

        # Δν = −M⁻¹ Jlᵀ λ, applied via the same scatter + substitution.
        f_loc = [None] * nL
        for c in range(nC):
            g = geo[c]
            lc = jnp.stack([g["active"] * lam[c][j] for j in range(3)])
            Rtl = _rtv(g["Rp"], lc)
            f6 = jnp.concatenate([Rtl, _cross(g["Lpb"], Rtl)])
            p = g["parent"]
            f_loc[p] = f6 if f_loc[p] is None else f_loc[p] + f6
        dv_loc, dsd = self._minv_apply(fact, f_loc, bshape, pr)

        if self.floating_base:
            W_dv = _xv(W_R[0], W_p[0], dv_loc[0])
            v_new = state.v - W_dv
        else:
            v_new = state.v
        return dataclasses.replace(
            state, v=v_new, sd=state.sd - dsd
        )

    def _contact_forces(self, state: BatchedState, W_R, W_p, W_v, tau, pr):
        """Contact-model dispatch → (per-link world 6D forces, ṁ)."""
        if self.n_points == 0:
            return [None] * self.n_links, jnp.zeros_like(state.m)
        if self.contact_model == "relaxed_rigid":
            f_links, _, xs = self.relaxed_rigid_contact_forces(
                state, W_R, W_p, W_v, tau, pr
            )
            # ṁ steers m toward the solved forces: the NEXT step's PCG
            # warm-starts from them (same carry trick as the rigid APGD).
            return f_links, (xs - state.m) / self.dt
        if self.contact_model == "rigid":
            f_links, _, xs = self.rigid_contact_forces(
                state, W_R, W_p, W_v, tau, pr
            )
            # ṁ steers m toward the solved forces so the NEXT step's APGD
            # warm-starts from them (SIE lands exactly on xs; RK4 blends
            # stage solutions — either is a fine initial iterate).
            return f_links, (xs - state.m) / self.dt
        return self.soft_contact_forces(W_R, W_p, W_v, state.m, pr)

    # ----- dynamics -----

    def aba(
        self,
        state: BatchedState,
        W_R,
        W_p,
        W_v,
        f_ext,
        tau,
        pr=None,
        return_aux: bool = False,
    ):
        """Articulated-Body Algorithm, trailing-batch, unrolled tree.

        Per-env dynamics domain randomization: optional batch-shaped
        multipliers ``pr["gmul"]`` (gravity) and ``pr["Mmul"]`` (all link
        spatial inertias, i.e. uniform density scaling) — absent keys cost
        nothing.

        With ``return_aux`` a third return value carries the link-frame
        accelerations ``a`` (gravity-offset convention) plus the
        configuration-only articulated factorization (inverse joint
        transforms, ``U``/``d``, base Cholesky factor ``L0``) that
        :meth:`_minv_apply` reuses for O(n) M⁻¹-style solves — the
        primitive of the relaxed-rigid contact PCG."""
        pr = pr if pr is not None else self.params()
        nL = self.n_links
        bshape = state.p.shape[1:]
        rel_R, rel_p = self._relative_transforms(state.s, pr)
        zb = jnp.zeros(bshape)
        gz = jnp.full(bshape, self.gravity_z)
        if "gmul" in pr:
            gz = gz * pr["gmul"]
        g6 = jnp.stack([zb, zb, gz, zb, zb, zb])

        Mscale = pr.get("Mmul") if "Mmul" in pr else None

        def _scaled_inertia(i):
            Mb = _bmat(pr["M"][i], 6, 6, bshape)
            if Mscale is None:
                return Mb
            if not _MOSAIC:
                return Mb * Mscale  # trailing-dim broadcast
            return jnp.stack(
                [
                    jnp.stack([Mb[a, b2] * Mscale for b2 in range(6)])
                    for a in range(6)
                ]
            )

        inv_R = [None] * nL
        inv_p = [None] * nL
        for i in range(1, nL):
            inv_R[i], inv_p[i] = _inv_rp(rel_R[i - 1], rel_p[i - 1])

        R0, p0 = W_R[0], W_p[0]
        R0_inv, p0_inv = _inv_rp(R0, p0)

        v = [None] * nL
        c = [None] * nL
        pA = [None] * nL
        MA = [None] * nL
        if self.floating_base:
            v[0] = _xv(R0_inv, p0_inv, state.v)
        else:
            v[0] = jnp.zeros((6,) + bshape)

        MA[0] = _scaled_inertia(0)
        pA[0] = _vxstar_Mv(v[0], MA[0])
        if f_ext[0] is not None:
            pA[0] = pA[0] - _xtf(R0, p0, f_ext[0])

        for i in range(1, nL):
            lam = self.lam[i]
            sdi = state.sd[i - 1]
            vJ = jnp.stack([pr["S"][i][k] * sdi for k in range(6)])
            v[i] = _xv(inv_R[i], inv_p[i], v[lam]) + vJ
            c[i] = _vx(v[i], vJ)
            MA[i] = _scaled_inertia(i)
            pA[i] = _vxstar_Mv(v[i], MA[i])
            if f_ext[i] is not None:
                pA[i] = pA[i] - _xtf(W_R[i], W_p[i], f_ext[i])

        U = [None] * nL
        d = [None] * nL
        u = [None] * nL
        for i in range(nL - 1, 0, -1):
            lam = self.lam[i]
            S = pr["S"][i]
            if not _MOSAIC:
                U[i] = jnp.einsum("ij...,j->i...", MA[i], S)
                d[i] = jnp.einsum("i,i...->...", S, U[i])
                u[i] = tau[i - 1] - jnp.einsum("i,i...->...", S, pA[i])
                inv_d = 1.0 / d[i]
                Ma = MA[i] - jnp.einsum("i...,j...->ij...", U[i], U[i]) * inv_d
            else:
                U[i] = jnp.stack(
                    [sum(MA[i][a, j] * S[j] for j in range(6)) for a in range(6)]
                )
                d[i] = sum(S[j] * U[i][j] for j in range(6))
                u[i] = tau[i - 1] - sum(S[j] * pA[i][j] for j in range(6))
                inv_d = 1.0 / d[i]
                Ma = MA[i] - jnp.stack(
                    [
                        jnp.stack([U[i][a] * U[i][b] * inv_d for b in range(6)])
                        for a in range(6)
                    ]
                )
            pa = pA[i] + _mv_u(Ma, c[i], 6) + U[i] * (u[i] * inv_d)
            if lam != 0 or self.floating_base:
                X = _build_X(inv_R[i], inv_p[i])
                if not _MOSAIC:
                    MA[lam] = MA[lam] + jnp.einsum(
                        "ji...,jk...,kl...->il...", X, Ma, X
                    )
                else:
                    MaX = _mm(Ma, X, 6)
                    MA[lam] = MA[lam] + jnp.stack(
                        [
                            jnp.stack(
                                [
                                    sum(X[k, a] * MaX[k, b] for k in range(6))
                                    for b in range(6)
                                ]
                            )
                            for a in range(6)
                        ]
                    )
                pA[lam] = pA[lam] + _mtv_u(X, pa, 6)

        L0 = None
        if self.floating_base:
            L0 = _chol6_factor(MA[0])
            a0 = -_chol6_substitute(L0, pA[0])
        else:
            a0 = -_xv(R0_inv, p0_inv, g6)

        a = [None] * nL
        a[0] = a0
        sdd = [None] * self.n_joints
        for i in range(1, nL):
            lam = self.lam[i]
            a_i = _xv(inv_R[i], inv_p[i], a[lam]) + c[i]
            if not _MOSAIC:
                sdd_i = (u[i] - jnp.einsum("i...,i...->...", U[i], a_i)) / d[i]
            else:
                sdd_i = (u[i] - sum(U[i][j] * a_i[j] for j in range(6))) / d[i]
            sdd[i - 1] = sdd_i
            a[i] = a_i + jnp.stack([pr["S"][i][k] * sdd_i for k in range(6)])

        if self.floating_base:
            W_a = _xv(R0, p0, a0) + g6
        else:
            W_a = jnp.zeros((6,) + bshape)
        sdd_out = jnp.stack(sdd) if sdd else jnp.zeros((0,) + bshape)
        if return_aux:
            aux = dict(a=a, U=U, d=d, inv_R=inv_R, inv_p=inv_p, L0=L0)
            return W_a, sdd_out, aux
        return W_a, sdd_out

    # ----- the step -----

    @staticmethod
    def _quat_derivative(q, omega, K: float = 0.0):
        """q̇ = ½ [0, ω] ⊗ q with inertial-fixed ω and optional Baumgarte
        norm stabilization r₀ = K‖ω‖(1-‖q‖) (matches
        ``math.Quaternion.derivative`` with ``omega_in_body_fixed=False``)."""
        qw, qx, qy, qz = q[0], q[1], q[2], q[3]
        ox, oy, oz = omega[0], omega[1], omega[2]
        qd = 0.5 * jnp.stack(
            [
                -qx * ox - qy * oy - qz * oz,
                qw * ox - qy * oz + qz * oy,
                qw * oy + qx * oz - qz * ox,
                qw * oz - qx * oy + qy * ox,
            ]
        )
        if K:
            nw = jnp.sqrt(jnp.maximum(ox * ox + oy * oy + oz * oz, 1e-14))
            nq = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=0), 1e-14))
            # First column of the Ω-matrix is q itself, so the Baumgarte
            # term contributes ½ r₀ q.
            qd = qd + (0.5 * K) * (nw * (1.0 - nq)) * q
        return qd

    @staticmethod
    def _normalize_quat(q):
        return q / jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=0), 1e-12))

    def derivatives(
        self,
        state: BatchedState,
        tau: jtp.Array | None = None,
        pr=None,
        frozen_contacts=None,
    ) -> BatchedState:
        """Continuous-time state derivative ẏ — the engine analog of
        ``js.ode.system_dynamics`` (reference ``api/ode.py:174-225``),
        returned as a ``BatchedState`` whose leaves are the derivatives of
        the corresponding state leaves. ``frozen_contacts`` optionally
        supplies precomputed ``(f_links, ṁ)`` (the RK4-fast path)."""
        pr = pr if pr is not None else self.params()
        bshape = state.p.shape[1:]
        tau = tau if tau is not None else jnp.zeros((self.n_joints,) + bshape)

        W_R, W_p, W_v = self.fk(state, pr)
        if self.n_constraints > 0:
            # Unified weld path: contact forces first, then the constraint
            # solve reacting to them, then one coupled ABA (generic-path
            # ordering, ``api/ode.py:41-77``).
            if frozen_contacts is not None:
                f_links, md = frozen_contacts
            else:
                f_links, md = self._contact_forces(
                    state, W_R, W_p, W_v, tau, pr
                )
            f_tot = self._with_constraint_forces(
                state, W_R, W_p, W_v, f_links, tau, pr
            )
            W_a, sdd = self.aba(state, W_R, W_p, W_v, f_tot, tau, pr)
        elif frozen_contacts is not None:
            f_links, md = frozen_contacts
            W_a, sdd = self.aba(state, W_R, W_p, W_v, f_links, tau, pr)
        elif self.contact_model == "relaxed_rigid" and self.n_points > 0:
            _, (W_a, sdd), xs = self.relaxed_rigid_contact_forces(
                state, W_R, W_p, W_v, tau, pr, return_accelerations=True
            )
            # Carry the solved forces in m for next-step PCG warm starts.
            md = (xs - state.m) / self.dt
        elif self.contact_model == "rigid" and self.n_points > 0:
            _, (W_a, sdd), xs = self.rigid_contact_forces(
                state, W_R, W_p, W_v, tau, pr, return_accelerations=True
            )
            # Carry the solved forces in m for next-step APGD warm starts.
            md = (xs - state.m) / self.dt
        else:
            if self.n_points > 0:
                f_links, md = self.soft_contact_forces(
                    W_R, W_p, W_v, state.m, pr
                )
            else:
                f_links, md = [None] * self.n_links, jnp.zeros_like(state.m)
            W_a, sdd = self.aba(state, W_R, W_p, W_v, f_links, tau, pr)

        omega = state.v[3:6]
        pd = state.v[0:3] + _cross(omega, state.p)
        qd = self._quat_derivative(state.q, omega, K=1.0)
        return BatchedState(s=state.sd, sd=sdd, p=pd, q=qd, v=W_a, m=md)

    def _rk4_step(self, state: BatchedState, tau, pr) -> BatchedState:
        """Classic RK4 over the full dynamics; with ``integrator ==
        "rk4fast"`` the contact forces/ṁ are evaluated once at t0 and frozen
        across the four stages (reference ``api/integrators.py:91-263``)."""
        dt = self.dt
        state = dataclasses.replace(state, q=self._normalize_quat(state.q))

        frozen = None
        if self.integrator == "rk4fast" and self.n_points > 0:
            W_R, W_p, W_v = self.fk(state, pr)
            frozen = self._contact_forces(state, W_R, W_p, W_v, tau, pr)

        f = lambda st: self.derivatives(st, tau, pr, frozen_contacts=frozen)
        axpy = lambda c, k: jax.tree.map(lambda y, d: y + c * d, state, k)

        k1 = f(state)
        k2 = f(axpy(0.5 * dt, k1))
        k3 = f(axpy(0.5 * dt, k2))
        k4 = f(axpy(dt, k3))
        comb = jax.tree.map(
            lambda a, b, c, d: (a + 2.0 * b + 2.0 * c + d) / 6.0, k1, k2, k3, k4
        )
        new = axpy(dt, comb)
        return dataclasses.replace(new, q=self._normalize_quat(new.q))

    def step(
        self, state: BatchedState, tau: jtp.Array | None = None, pr=None
    ) -> BatchedState:
        """One integrator step with soft contacts (trailing batch):
        semi-implicit Euler, RK4, or RK4-fast per ``self.integrator``."""
        pr = pr if pr is not None else self.params()
        bshape = state.p.shape[1:]
        tau = tau if tau is not None else jnp.zeros((self.n_joints,) + bshape)

        if self.integrator in ("rk4", "rk4fast"):
            new = self._rk4_step(state, tau, pr)
            if self.contact_model == "rigid" and self.n_points > 0:
                new = self.rigid_impact_projection(new, pr)
            return new

        W_R, W_p, W_v = self.fk(state, pr)
        if self.n_constraints > 0:
            f_links, md = self._contact_forces(state, W_R, W_p, W_v, tau, pr)
            f_tot = self._with_constraint_forces(
                state, W_R, W_p, W_v, f_links, tau, pr
            )
            W_a, sdd = self.aba(state, W_R, W_p, W_v, f_tot, tau, pr)
        elif self.contact_model == "relaxed_rigid" and self.n_points > 0:
            _, (W_a, sdd), xs = self.relaxed_rigid_contact_forces(
                state, W_R, W_p, W_v, tau, pr, return_accelerations=True
            )
            # Carry the solved forces in m for next-step PCG warm starts.
            md = (xs - state.m) / self.dt
        elif self.contact_model == "rigid" and self.n_points > 0:
            _, (W_a, sdd), xs = self.rigid_contact_forces(
                state, W_R, W_p, W_v, tau, pr, return_accelerations=True
            )
            # Carry the solved forces in m for next-step APGD warm starts.
            md = (xs - state.m) / self.dt
        else:
            if self.n_points > 0:
                f_links, md = self.soft_contact_forces(
                    W_R, W_p, W_v, state.m, pr
                )
            else:
                f_links, md = [None] * self.n_links, jnp.zeros_like(state.m)
            W_a, sdd = self.aba(state, W_R, W_p, W_v, f_links, tau, pr)

        dt = self.dt
        v_new = state.v + dt * W_a
        sd_new = state.sd + dt * sdd

        omega = v_new[3:6]
        pd = v_new[0:3] + _cross(omega, state.p)
        p_new = state.p + dt * pd

        qd = self._quat_derivative(state.q, omega)
        q_new = self._normalize_quat(state.q + dt * qd)

        new = BatchedState(
            s=state.s + dt * sd_new,
            sd=sd_new,
            p=p_new,
            q=q_new,
            v=v_new,
            m=state.m + dt * md,
        )
        if self.contact_model == "rigid" and self.n_points > 0:
            new = self.rigid_impact_projection(new, pr)
        return new

    def rollout(
        self, state: BatchedState, n_steps: int, policy=None, domain=None
    ) -> BatchedState:
        """On-device lax.scan rollout; ``policy(state) -> (n, *b)`` torques.

        ``domain``: optional dict of per-env multipliers (each
        batch-shaped) for domain randomization: ``Kmul``/``Dmul``/``mumul``
        (contacts, see :meth:`soft_contact_forces`) and ``gmul``/``Mmul``
        (gravity / link inertias, see :meth:`aba`)."""
        policy = policy or (lambda st: -60.0 * st.s - 0.5 * st.sd)
        pr = self.params()
        if domain:
            pr = {**pr, **domain}

        def body(st, _):
            return self.step(st, policy(st), pr), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out


def _freeze(a) -> tuple:
    """Nested tuples (hashable static payload) preserving shape."""
    a = np.asarray(a)
    if a.ndim == 0:
        return float(a)
    return tuple(_freeze(x) for x in a)


def _nominal_delassus_blocks(model) -> np.ndarray:
    """(nC, 3, 3) per-point Delassus blocks ``G_cc = (J M⁻¹ Jᵀ)_cc`` at
    the nominal configuration (zero joint angles, identity base
    orientation), in the mixed (world-aligned) point frame — the true
    articulated compliance at each collidable point, unlike the scalar
    ``1/m`` of ``rrMinv``. Static build-time payload of the block-Jacobi
    PCG preconditioner for rough-terrain relaxed-rigid engines (reference
    impedance design ``rbda/contacts/relaxed_rigid.py:525-653``).

    Computed densely through the public API (CRBA mass-matrix inverse +
    mixed collidable-point jacobians — the same quantities the generic
    relaxed-rigid path assembles), pinned to the host CPU backend: it is
    a tiny B=1 graph whose result is a frozen constant, and on
    tunneled-TPU machines a remote compile would dominate engine build
    time."""
    import jaxsim_tpu.api as js_api
    from jaxsim_tpu.api.common import VelRepr

    def blocks():
        data = js_api.data.JaxSimModelData.build(
            model, velocity_representation=VelRepr.Mixed
        )
        Minv = js_api.model.free_floating_mass_matrix_inverse(model, data)
        J = js_api.contact.jacobian(
            model, data, output_vel_repr=VelRepr.Mixed
        )[:, 0:3, :]
        K = jnp.einsum("cik,kl,cjl->cij", J, Minv, J)
        return 0.5 * (K + jnp.swapaxes(K, 1, 2))

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:  # noqa: BLE001 — fall back to the default device
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return np.asarray(jax.device_get(jax.jit(blocks)()))
    return np.asarray(jax.device_get(jax.jit(blocks)()))


def _vx(v, w):
    """Motion cross product ν × w: [[ω̂, v̂],[0, ω̂]] w."""
    vl, va = v[0:3], v[3:6]
    wl, wa = w[0:3], w[3:6]
    return jnp.concatenate([_cross(va, wl) + _cross(vl, wa), _cross(va, wa)])


def _vxstar_Mv(v, M):
    """ν×* (M ν): [ω×f_l ; v×f_l + ω×f_a] with f = M ν."""
    Mv = _mv_u(M, v, 6)
    vl, va = v[0:3], v[3:6]
    fl, fa = Mv[0:3], Mv[3:6]
    return jnp.concatenate([_cross(va, fl), _cross(vl, fl) + _cross(va, fa)])
