"""Tracer detection helpers (reference: ``src/jaxsim/utils/tracing.py:8-17``)."""

from __future__ import annotations

import jax.core
import jax.interpreters.partial_eval


def tracing(var) -> bool:
    """Return True if ``var`` is a JAX tracer."""
    return isinstance(var, jax.core.Tracer)


def not_tracing(var) -> bool:
    return not tracing(var)
