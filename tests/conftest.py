"""Test configuration.

Tests run on CPU (8 virtual devices for sharding tests) regardless of the
environment's default TPU backend: the env vars below must be set before JAX
initializes its backends, and the config update covers the case where the
axon sitecustomize already forced its platform list.
"""

from __future__ import annotations

import os

_USE_TPU = os.environ.get("JAXSIM_TEST_TPU", "0") == "1"

if not _USE_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        _flags += " --xla_force_host_platform_device_count=8"
    # Parallel codegen splitting only adds module-split overhead when the
    # box has a single core (measured: -30% generic-step compile time).
    if "xla_cpu_parallel_codegen_split_count" not in _flags:
        _flags += " --xla_cpu_parallel_codegen_split_count=1"
    os.environ["XLA_FLAGS"] = _flags.strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("MUJOCO_GL", "egl")  # headless offline rendering
# XLA:CPU AOT cache loads spam E-level "machine feature +prefer-no-gather is
# not supported on the host" on EVERY warm entry: the compile side records
# LLVM tuning flags (prefer-no-gather/scatter) that the loader's host-feature
# probe never reports, so same-machine loads false-positive. Python-level
# errors still raise; silence the C++ log noise for test runs only.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    # The CPU fast tier is bounded by XLA compile time (unrolled RBDA graphs
    # on a single core): skipping the expensive optimization passes cuts
    # engine-step compiles ~40% at a small runtime cost that the short
    # test workloads never recoup. The opt-in slow/stress tiers run with
    # FULL optimization (Makefile sets JAXSIM_TEST_FAST_COMPILE=0) so at
    # least one CPU tier tests the optimized-XLA numerics production CPU
    # users get. TPU runs always keep full optimization.
    if os.environ.get("JAXSIM_TEST_FAST_COMPILE", "1") == "1":
        jax.config.update("jax_disable_most_optimizations", True)

# Persistent compilation cache: the suite is compile-dominated (many jitted
# physics graphs); repeat runs hit the cache and finish in minutes. The dir
# is platform-suffixed AND (for CPU) machine-fingerprinted: XLA:CPU caches
# AOT executables specialized to the compiling host's ISA features, and
# loading entries produced on a different machine (shared volume, container
# migration) warns "could lead to execution errors such as SIGILL".
def _cpu_cache_suffix() -> str:
    import hashlib
    import platform

    tag = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += hashlib.blake2b(
                        line.encode(), digest_size=4
                    ).hexdigest()
                    break
    except OSError:
        pass
    return tag


_cache_dir = os.path.join(
    os.path.dirname(__file__),
    "..",
    ".jax_cache_tpu" if _USE_TPU else f".jax_cache_cpu_{_cpu_cache_suffix()}",
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
# Write EVERY compile to the cache (threshold 0): on a small-core box the
# xdist workers race to compile the same graphs, and an early cache write is
# the only cross-worker dedup there is.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest

import jaxsim_tpu  # noqa: E402  (after backend forcing)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: tests that require a real TPU")


@pytest.fixture(scope="session")
def prng_seed() -> int:
    return int(os.environ.get("JAXSIM_TEST_SEED", 42))


@pytest.fixture
def prng_key(prng_seed):
    return jax.random.PRNGKey(prng_seed)


@pytest.fixture(scope="session")
def velocity_representations():
    from jaxsim_tpu.api.common import VelRepr

    return [VelRepr.Inertial, VelRepr.Body, VelRepr.Mixed]


def assert_allclose(a, b, rtol=2e-5, atol=1e-6, err_msg=""):
    """Comparison helper normalizing signed zeros (reference
    ``tests/utils.py:14-26``) with float32-appropriate default tolerances."""
    a = np.asarray(a) + 0.0
    b = np.asarray(b) + 0.0
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=err_msg)
