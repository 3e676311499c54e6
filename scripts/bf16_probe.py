#!/usr/bin/env python
"""bf16-vs-f32 VPU rate probe (VERDICT r04 #9 groundwork).

The fused physics kernels are f32 elementwise VPU math. bf16 would help
only if (a) the VPU retires bf16 elementwise FMAs faster than f32, or
(b) VMEM footprint is the binding constraint (RK4's four live stages).
This probe measures (a) with the validated all-FMA methodology from
bench.py's VPU calibration (per-program output blocks, in-jit scalar
reduction — plain block_until_ready returns early on this platform),
in f32, bf16, and a mixed variant (bf16 storage, f32 math) that models
"bf16 contact math, f32 state". Results + the ship/reject decision live
in docs/ops.md.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
from jax import ShapeDtypeStruct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

R, G, CH, T = 32, 128, 6, 65536


def build(dtype, cast_each_iter=False, T_=T):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        c = tuple((x * (0.5 ** i)).astype(dtype) for i in range(CH))

        def body(_, cc):
            if cast_each_iter:
                return tuple(
                    (a.astype(jnp.float32) * 0.9999991 + 1.1e-7).astype(dtype)
                    for a in cc
                )
            one = jnp.asarray(0.9999991, dtype)
            eps = jnp.asarray(1.1e-7, dtype)
            return tuple(a * one + eps for a in cc)

        c = jax.lax.fori_loop(0, T_, body, c)
        acc = c[0]
        for a in c[1:]:
            acc = acc + a
        o_ref[0] = acc

    f = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        out_shape=ShapeDtypeStruct((G, R, 128), dtype),
    )
    return jax.jit(lambda x_: jnp.sum(f(x_).astype(jnp.float32)))


def time_med(f, x, reps=5):
    float(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[reps // 2]


def main() -> None:
    for name, dtype, cast in (
        ("f32", jnp.float32, False),
        ("bf16", jnp.bfloat16, False),
        ("bf16-store/f32-math", jnp.bfloat16, True),
    ):
        x = jnp.full((R, 128), 0.5, dtype)
        t_full = time_med(build(dtype, cast), x)
        t_base = time_med(build(dtype, cast, T_=16), x)
        fl = 2.0 * R * 128 * (T - 16) * CH * G
        rate = fl / max(t_full - t_base, 1e-9) / 1e12
        print(f"{name:>22}: {rate:6.2f} TFLOP/s (t={t_full*1e3:.1f}ms)")


if __name__ == "__main__":
    main()
