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


def raise_runtime_error_if(condition: jtp.BoolLike, msg: str, *args, **kwargs) -> None:
    raise_if(condition, RuntimeError, msg, *args, **kwargs)
