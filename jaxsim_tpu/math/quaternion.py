"""Quaternion algebra (wxyz), batched, self-contained (no jaxlie).

Feature parity with reference ``src/jaxsim/math/quaternion.py`` (to/from DCM,
Baumgarte-stabilized derivative, SO(3)-manifold integration) plus the batched
primitives (product, exp, normalize) the rest of the framework builds on.
"""

from __future__ import annotations

import jax.numpy as jnp

import jaxsim_tpu.typing as jtp

from .utils import safe_norm

_EPS_ANGLE = 1e-6


class Quaternion:
    """wxyz quaternion utilities; all functions batched over leading dims."""

    @staticmethod
    def to_xyzw(wxyz: jtp.VectorLike) -> jtp.Vector:
        q = jnp.asarray(wxyz)
        return q[..., jnp.array([1, 2, 3, 0])]

    @staticmethod
    def to_wxyz(xyzw: jtp.VectorLike) -> jtp.Vector:
        q = jnp.asarray(xyzw)
        return q[..., jnp.array([3, 0, 1, 2])]

    @staticmethod
    def normalize(wxyz: jtp.VectorLike) -> jtp.Vector:
        q = jnp.asarray(wxyz)
        return q / safe_norm(q, axis=-1, keepdims=True)

    @staticmethod
    def product(q1: jtp.VectorLike, q2: jtp.VectorLike) -> jtp.Vector:
        """Hamilton product q1 ⊗ q2 (both wxyz)."""
        q1, q2 = jnp.asarray(q1), jnp.asarray(q2)
        w1, x1, y1, z1 = (q1[..., i] for i in range(4))
        w2, x2, y2, z2 = (q2[..., i] for i in range(4))
        return jnp.stack(
            [
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ],
            axis=-1,
        )

    @staticmethod
    def conjugate(wxyz: jtp.VectorLike) -> jtp.Vector:
        q = jnp.asarray(wxyz)
        return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)

    @staticmethod
    def to_dcm(quaternion: jtp.VectorLike) -> jtp.Matrix:
        """wxyz quaternion → ``(..., 3, 3)`` rotation matrix (norm-robust)."""
        q = jnp.asarray(quaternion)
        w, x, y, z = (q[..., i] for i in range(4))
        n = w * w + x * x + y * y + z * z
        s = 2.0 / jnp.where(n == 0, 1.0, n)
        wx, wy, wz = s * w * x, s * w * y, s * w * z
        xx, xy, xz = s * x * x, s * x * y, s * x * z
        yy, yz, zz = s * y * y, s * y * z, s * z * z
        one = jnp.ones_like(w)
        return jnp.stack(
            [
                jnp.stack([one - (yy + zz), xy - wz, xz + wy], axis=-1),
                jnp.stack([xy + wz, one - (xx + zz), yz - wx], axis=-1),
                jnp.stack([xz - wy, yz + wx, one - (xx + yy)], axis=-1),
            ],
            axis=-2,
        )

    @staticmethod
    def from_dcm(dcm: jtp.MatrixLike) -> jtp.Vector:
        """``(..., 3, 3)`` rotation matrix → wxyz quaternion (branchless Shepperd)."""
        m = jnp.asarray(dcm)
        m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

        # Four candidate (unnormalized) quaternions, one per dominant pivot.
        qw = jnp.stack([1.0 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
        qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
        qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
        qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

        # Pivot scores: trace-based selection identical to Shepperd's method.
        tr = m00 + m11 + m22
        scores = jnp.stack([tr, m00, m11, m22], axis=-1)
        best = jnp.argmax(scores, axis=-1)

        cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
        q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
            ..., 0, :
        ]
        q = q / safe_norm(q, axis=-1, keepdims=True)
        # Canonical sign: w >= 0.
        return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)

    @staticmethod
    def exp(tangent: jtp.VectorLike) -> jtp.Vector:
        """SO(3) exponential: rotation vector ``(..., 3)`` → wxyz quaternion."""
        v = jnp.asarray(tangent)
        theta = safe_norm(v, axis=-1, keepdims=True)
        half = 0.5 * theta
        # sin(θ/2)/θ with a second-order Taylor fallback at θ → 0.
        small = theta < _EPS_ANGLE
        theta_safe = jnp.where(small, 1.0, theta)
        k = jnp.where(small, 0.5 - theta**2 / 48.0, jnp.sin(half) / theta_safe)
        w = jnp.cos(half)
        return jnp.concatenate([w, k * v], axis=-1)

    @staticmethod
    def log(wxyz: jtp.VectorLike) -> jtp.Vector:
        """SO(3) logarithm: wxyz quaternion → rotation vector ``(..., 3)``."""
        q = Quaternion.normalize(wxyz)
        q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
        w = q[..., 0:1]
        xyz = q[..., 1:]
        n = safe_norm(xyz, axis=-1, keepdims=True)
        angle = 2.0 * jnp.arctan2(n, w)
        small = n < _EPS_ANGLE
        n_safe = jnp.where(small, 1.0, n)
        scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS_ANGLE), angle / n_safe)
        return scale * xyz

    @staticmethod
    def derivative(
        quaternion: jtp.VectorLike,
        omega: jtp.VectorLike,
        omega_in_body_fixed: bool = False,
        K: float = 0.1,
    ) -> jtp.Vector:
        """Quaternion kinematics q̇ = ½ Q(q) [K‖ω‖(1-‖q‖); ω] with Baumgarte
        norm stabilization (reference ``math/quaternion.py:68-131``)."""
        q = jnp.asarray(quaternion)
        w = jnp.asarray(omega)
        qw, qx, qy, qz = (q[..., i] for i in range(4))

        if omega_in_body_fixed:
            # q̇ = ½ q ⊗ [0, ω]
            Q = jnp.stack(
                [
                    jnp.stack([qw, -qx, -qy, -qz], -1),
                    jnp.stack([qx, qw, -qz, qy], -1),
                    jnp.stack([qy, qz, qw, -qx], -1),
                    jnp.stack([qz, -qy, qx, qw], -1),
                ],
                axis=-2,
            )
        else:
            # q̇ = ½ [0, ω] ⊗ q
            Q = jnp.stack(
                [
                    jnp.stack([qw, -qx, -qy, -qz], -1),
                    jnp.stack([qx, qw, qz, -qy], -1),
                    jnp.stack([qy, -qz, qw, qx], -1),
                    jnp.stack([qz, qy, -qx, qw], -1),
                ],
                axis=-2,
            )

        norm_w = safe_norm(w, axis=-1, keepdims=True)
        norm_q = safe_norm(q, axis=-1, keepdims=True)
        rhs = jnp.concatenate([K * norm_w * (1.0 - norm_q), w], axis=-1)
        return 0.5 * jnp.einsum("...ij,...j->...i", Q, rhs)

    @staticmethod
    def integration(
        quaternion: jtp.VectorLike,
        dt: jtp.FloatLike,
        omega: jtp.VectorLike,
        omega_in_body_fixed: jtp.BoolLike = False,
    ) -> jtp.Vector:
        """Integrate on the SO(3) manifold via the exponential map
        (reference ``math/quaternion.py:133-169``)."""
        q = jnp.asarray(quaternion)
        w = jnp.asarray(omega)
        dq = Quaternion.exp(dt * w)
        body = Quaternion.product(q, dq)
        inertial = Quaternion.product(dq, q)
        return jnp.where(jnp.asarray(omega_in_body_fixed), body, inertial)
