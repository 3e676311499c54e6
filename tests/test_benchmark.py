"""Benchmark infrastructure (reference ``tests/test_benchmark.py``).

Wall-time measurements of the hot kernels, excluded from the default run;
enable with ``pytest -m benchmark --no-header -rN``. Mirrors the reference's
pytest-benchmark suite (aba, bias forces, FK, CRBA, J, J̇, the contact
models via system_dynamics, full step, hw update) with explicit
``block_until_ready`` timing.
"""

import time

import jax
import jax.numpy as jnp
import pytest

import jaxsim_tpu.api as js
from jaxsim_tpu import models, ops

pytestmark = pytest.mark.benchmark


@pytest.fixture(scope="module")
def setup():
    model = js.JaxSimModel.build_from_model_description(models.build_humanoid_urdf())
    model = model.replace(
        contact_params=js.contact.estimate_good_contact_parameters(
            model,
            number_of_active_collidable_points_steady_state=8,
            max_penetration=0.006,
            damping_ratio=0.15,
        )
    )
    data = js.data.random_model_data(model, key=jax.random.PRNGKey(0))
    return model, data


def timeit(fn, *args, reps: int = 20) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[reps // 2]


def report(name: str, t: float) -> None:
    print(f"\n[bench] {name}: {t * 1e6:.1f} us")


def test_bench_aba(setup):
    model, data = setup
    f = jax.jit(lambda m, d: js.model.forward_dynamics_aba(m, d))
    report("forward_dynamics_aba", timeit(f, model, data))


def test_bench_bias_forces(setup):
    model, data = setup
    f = jax.jit(lambda m, d: js.model.free_floating_bias_forces(m, d))
    report("free_floating_bias_forces", timeit(f, model, data))


def test_bench_crba(setup):
    model, data = setup
    f = jax.jit(lambda m, d: js.model.free_floating_mass_matrix(m, d))
    report("free_floating_mass_matrix", timeit(f, model, data))


def test_bench_mass_inverse(setup):
    model, data = setup
    f = jax.jit(lambda m, d: js.model.free_floating_mass_matrix_inverse(m, d))
    report("free_floating_mass_matrix_inverse", timeit(f, model, data))


def test_bench_jacobian(setup):
    model, data = setup
    f = jax.jit(lambda m, d: js.model.generalized_free_floating_jacobian(m, d))
    report("generalized_free_floating_jacobian", timeit(f, model, data))


def test_bench_jacobian_derivative(setup):
    model, data = setup
    f = jax.jit(
        lambda m, d: js.model.generalized_free_floating_jacobian_derivative(m, d)
    )
    report("jacobian_derivative", timeit(f, model, data))


def test_bench_fk(setup):
    model, data = setup
    f = jax.jit(lambda m, d: d.update_cache(m)._link_transforms)
    report("forward_kinematics", timeit(f, model, data))


@pytest.mark.parametrize("contact", ["soft", "rigid", "relaxed"])
def test_bench_system_dynamics(setup, contact):
    model, data = setup
    if contact != "soft":
        from jaxsim_tpu.ops.contacts import (
            RelaxedRigidContacts,
            RelaxedRigidContactsParams,
            RigidContacts,
            RigidContactsParams,
        )

        if contact == "rigid":
            model = model.replace(
                contact_model=RigidContacts(),
                contact_params=RigidContactsParams.build(),
            )
        else:
            model = model.replace(
                contact_model=RelaxedRigidContacts(),
                contact_params=RelaxedRigidContactsParams.build(),
            )
    f = jax.jit(lambda m, d: js.ode.system_dynamics(m, d))
    report(f"system_dynamics[{contact}]", timeit(f, model, data))


def test_bench_full_step(setup):
    model, data = setup
    f = jax.jit(lambda m, d: js.model.step(m, d))
    report("step", timeit(f, model, data))


def test_bench_batched_engine_step(setup):
    from jaxsim_tpu.ops.batched_engine import BatchedEngine

    model, _ = setup
    eng = BatchedEngine.build(model)
    st = eng.init_state(1024)
    f = jax.jit(lambda s: eng.step(s))
    report("batched_engine.step[B=1024]", timeit(f, st))


def test_bench_hw_update(setup):
    from jaxsim_tpu.api import hw_parameters as hw

    model, _ = setup
    model = hw.with_hw_metadata(model)
    sf = hw.ScalingFactors.ones(model.number_of_links())
    f = jax.jit(lambda m, s: hw.update_hw_parameters(m, s).kin_dyn_parameters.link_parameters.mass)
    report("update_hw_parameters", timeit(f, model, sf))
