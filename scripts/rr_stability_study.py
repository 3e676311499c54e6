#!/usr/bin/env python
"""Rough-terrain relaxed-rigid PCG iteration-budget stability study.

Sweeps the PCG iteration budget on the Fourier-terrain humanoid at bench
scale (fused kernel, B=8192) and reports, per budget: finiteness over a
contact-rich horizon, max |Δp| vs a high-iteration reference solve, and
fused throughput. Written for the round-4→5 preconditioner work: with the
scalar (1/m) Jacobi preconditioner the measured stability floor was 24
iterations (32 shipped); the block-Jacobi preconditioner (rrKc nominal
Delassus blocks) is expected to halve that. Results land in docs/ops.md.

Usage: python scripts/rr_stability_study.py [iters ...] (default 8 12 16 24 32)
Env: STUDY_BATCH (8192), STUDY_STEPS (400), STUDY_REF_ITERS (64).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

# The JAX_COMPILATION_CACHE_DIR env var is ignored by this jax build —
# the cache dir must be set through jax.config (see bench.py).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> None:
    budgets = [int(a) for a in sys.argv[1:]] or [8, 12, 16, 24, 32]
    B = int(os.environ.get("STUDY_BATCH", "8192"))
    steps = int(os.environ.get("STUDY_STEPS", "400"))
    ref_iters = int(os.environ.get("STUDY_REF_ITERS", "64"))

    import jaxsim_tpu.api as js
    from jaxsim_tpu import models
    from jaxsim_tpu.ops import pallas_step as ps
    from jaxsim_tpu.ops.batched_engine import BatchedEngine
    from jaxsim_tpu.ops.contacts.relaxed_rigid import RelaxedRigidContacts
    from jaxsim_tpu.terrain import FourierTerrain

    model = js.JaxSimModel.build_from_model_description(
        models.build_humanoid_urdf(),
        terrain=FourierTerrain.build(
            seed=0, num_components=8, amplitude=0.04, wavelength=0.7
        ),
        contact_model=RelaxedRigidContacts(),
    )
    eng0 = BatchedEngine.build(model)
    st0 = ps.tile_state(eng0.init_state(B, key=jax.random.PRNGKey(9)))
    tile = int(os.environ.get("STUDY_TILE", "16"))
    print(
        f"# humanoid x fourier x relaxed-rigid: B={B} steps={steps} "
        f"tile={tile} block_prec={bool(eng0._rr_Kc)} "
        f"shipped_iters={eng0._rr_n_iter}"
    )

    def run_budget(n_it):
        eng = dataclasses.replace(eng0, rr_iterations=n_it)
        run = jax.jit(ps.build_pallas_rollout(eng, steps, tile_sub=tile))
        o = run(st0)
        jax.block_until_ready(o.p)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o2 = run(st0)
            jax.block_until_ready(o2.p)
            ts.append(time.perf_counter() - t0)
        rate = B * steps / sorted(ts)[1]
        finite = bool(jnp.all(jnp.isfinite(o.p)).item()) and bool(
            jnp.all(jnp.isfinite(o.v)).item()
        )
        return o, rate, finite

    ref, ref_rate, ref_finite = run_budget(ref_iters)
    print(
        f"# reference solve: iters={ref_iters} finite={ref_finite} "
        f"rate={ref_rate/1e6:.2f}M"
    )
    if not ref_finite:
        print("# REFERENCE NON-FINITE — study invalid")
        sys.exit(1)

    print(f"{'iters':>6} {'finite':>7} {'max|dp| (m)':>14} {'rate':>9}")
    for n_it in budgets:
        o, rate, finite = run_budget(n_it)
        if finite:
            dp = float(jnp.max(jnp.abs(o.p - ref.p)))
            dp_s = f"{dp:.3e}"
        else:
            dp_s = "nan"
        print(f"{n_it:>6} {str(finite):>7} {dp_s:>14} {rate/1e6:>7.2f}M")


if __name__ == "__main__":
    main()
