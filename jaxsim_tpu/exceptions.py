"""Runtime validation inside traced code.

The reference raises host-side exceptions from jitted code through
``jax.debug.callback`` (``src/jaxsim/exceptions.py:6-60``) but force-disables
the mechanism on TPU. Here the default validation story is TPU-compatible:

* ``raise_if`` uses ``checkify``-style debug callbacks when running on CPU and
  ``JAXSIM_ENABLE_EXCEPTIONS=1`` is set (same opt-in as the reference);
* otherwise it is a no-op, and callers should rely on
  :func:`jaxsim_tpu.utils.nan_guard` sentinels for production monitoring.
"""

from __future__ import annotations

import os

import jax

import jaxsim_tpu.typing as jtp


def _enabled() -> bool:
    if os.environ.get("JAXSIM_ENABLE_EXCEPTIONS", "0") == "0":
        return False
    # The debug-callback bridge only works reliably on CPU backends.
    return jax.default_backend() in ("cpu",)


def raise_if(
    condition: jtp.BoolLike,
    exception: type,
    msg: str,
    *args,
    **kwargs,
) -> None:
    """Raise a host-side exception if ``condition`` is True inside traced code.

    No-op unless ``JAXSIM_ENABLE_EXCEPTIONS=1`` and the backend is CPU
    (mirrors the reference's TPU gating, ``src/jaxsim/exceptions.py:24-28``).
    """

    if not _enabled():
        return

    # Resolve the format string eagerly so the callback only formats.
    fmt = msg.format(*args, **kwargs) if (args or kwargs) else msg

    def _raise(cond) -> None:
        if cond:
            raise exception(fmt)

    jax.debug.callback(_raise, condition)


def raise_value_error_if(condition: jtp.BoolLike, msg: str, *args, **kwargs) -> None:
    raise_if(condition, ValueError, msg, *args, **kwargs)


def validate_quaternion(quaternion_wxyz) -> None:
    """Runtime check on a base quaternion: NaN and non-unit norm.

    Mirrors the reference's ``process_inputs`` validation on every RBDA
    entry (``src/jaxsim/rbda/utils.py:136-146``). No-op unless
    ``JAXSIM_ENABLE_EXCEPTIONS=1`` on CPU; TPU users should rely on
    :func:`jaxsim_tpu.utils.nan_guard` sentinels instead.
    """
    if not _enabled():
        return
    import jax.numpy as jnp

    q = jnp.asarray(quaternion_wxyz)
    raise_runtime_error_if(
        jnp.any(jnp.isnan(q)), "The quaternion contains NaN values."
    )
    raise_runtime_error_if(
        jnp.abs(jnp.linalg.norm(q, axis=-1) - 1.0).max() > 1e-3,
        "The quaternion is not normalized.",
    )


def validate_base_transform(base_transform) -> None:
    """Runtime check on a 4x4 base transform: NaN and non-orthonormal
    rotation block (the transform-level analog of the reference's
    quaternion validation — our RBDA entry points take ``W_H_B``)."""
    if not _enabled():
        return
    import jax.numpy as jnp

    H = jnp.asarray(base_transform)
    raise_runtime_error_if(
        jnp.any(jnp.isnan(H)), "The base transform contains NaN values."
    )
    R = H[..., :3, :3]
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - jnp.eye(3)).max()
    raise_runtime_error_if(
        err > 1e-3, "The base transform rotation block is not orthonormal."
    )


def raise_runtime_error_if(condition: jtp.BoolLike, msg: str, *args, **kwargs) -> None:
    raise_if(condition, RuntimeError, msg, *args, **kwargs)
