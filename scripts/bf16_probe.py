#!/usr/bin/env python
"""bf16-vs-f32 VPU rate probe (VERDICT r04 #9 groundwork).

The fused physics kernels are f32 elementwise VPU math. bf16 would help
only if (a) the VPU retires bf16 elementwise FMAs faster than f32, or
(b) VMEM footprint is the binding constraint (RK4's four live stages).
This probe measures (a) directly with the same all-FMA Pallas kernel
bench.py uses for the f32 VPU-peak calibration, in both dtypes, plus a
mixed variant (bf16 storage, f32 accumulate) that models "bf16 contact
math, f32 state". Results + the ship/reject decision land in docs/ops.md.
"""

from __future__ import annotations

import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache_tpu"),
)
import jax.numpy as jnp
from jax import ShapeDtypeStruct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, T, G = 64, 8192, 32


def build(dtype, cast_each_iter=False):
    def kern(x_ref, o_ref):
        x = x_ref[:]

        def body(_, c):
            a, b, cc, d = c
            if cast_each_iter:
                # bf16 storage, f32 math: the round-trip cast per FMA is
                # the cost a mixed-precision contact stage would pay.
                a = (a.astype(jnp.float32) * 0.9999991 + 1.1e-7).astype(dtype)
                b = (b.astype(jnp.float32) * 0.9999992 + 1.2e-7).astype(dtype)
                cc = (cc.astype(jnp.float32) * 0.9999993 + 1.3e-7).astype(dtype)
                d = (d.astype(jnp.float32) * 0.9999994 + 1.4e-7).astype(dtype)
            else:
                one = jnp.asarray(0.9999991, dtype)
                eps = jnp.asarray(1.1e-7, dtype)
                a = a * one + eps
                b = b * one + eps
                cc = cc * one + eps
                d = d * one + eps
            return (a, b, cc, d)

        a, b, cc, d = jax.lax.fori_loop(
            0, T, body,
            (x, (x * 0.5).astype(dtype), (x * 0.25).astype(dtype),
             (x * 0.125).astype(dtype)),
        )
        o_ref[:] = (a + b + cc + d).astype(dtype)

    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=ShapeDtypeStruct((R, 128), dtype),
    )


def measure(f, x):
    y = f(x)
    jax.block_until_ready(y)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        y = f(x)
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    flops = 2.0 * R * 128 * T * 4 * G
    return flops / sorted(ts)[3] / 1e12


def main() -> None:
    for name, dtype, cast in (
        ("f32", jnp.float32, False),
        ("bf16", jnp.bfloat16, False),
        ("bf16-store/f32-math", jnp.bfloat16, True),
    ):
        x = jnp.full((R, 128), 0.5, dtype)
        rate = measure(build(dtype, cast), x)
        print(f"{name:>22}: {rate:6.2f} TFLOP/s")


if __name__ == "__main__":
    main()
