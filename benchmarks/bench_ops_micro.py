"""Per-op cost of the fused-kernel primitives on the real chip.

Times Pallas kernels that apply N copies of one primitive (lane roll,
sublane roll, add, multiply, select, 5-piece concat) to (W, nx) f32
planes at the flagship block geometry, so kernel-optimization decisions
(roll reduction vs elementwise shaving) rest on measured per-op costs
instead of guesses.

Usage: python benchmarks/bench_ops_micro.py [R] [n_planes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(R=256, n_planes=10):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny = nx = 1024
    H = 16
    W = R + 2 * H
    nb = ny // R
    hb = ny // H
    NOP = 32  # primitives per plane per call

    def make_call(body):
        def kernel(s_c, s_u, s_d, out):
            s = jnp.concatenate([s_u[:], s_c[:], s_d[:]], axis=1)
            planes = [s[i] for i in range(n_planes)]
            planes = body(planes)
            for i in range(n_planes):
                out[i] = planes[i][H:H + R]

        center = pl.BlockSpec((n_planes, R, nx), lambda i: (0, i, 0))
        halo_up = pl.BlockSpec((n_planes, H, nx),
                               lambda i: (0, (i * (R // H) - 1) % hb, 0))
        halo_dn = pl.BlockSpec(
            (n_planes, H, nx),
            lambda i: (0, (i * (R // H) + R // H) % hb, 0))
        call = pl.pallas_call(
            kernel, grid=(nb,),
            in_specs=[center, halo_up, halo_dn],
            out_specs=pl.BlockSpec((n_planes, R, nx), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_planes, ny, nx), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("parallel",)))

        def step(s):
            return call(s, s, s)

        return step

    def time_call(step, n_calls=200):
        s = jnp.full((n_planes, ny, nx), 0.5, jnp.float32)

        def steps(n, s):
            return jax.lax.fori_loop(0, n, lambda _, x: step(x), s)

        run = jax.jit(steps, static_argnums=0, donate_argnums=1)
        out = run(n_calls, s)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(n_calls, out)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_calls * 1e3  # ms/call

    def body_noop(planes):
        return [p * 1.0000001 for p in planes]

    def body_add(planes):
        out = []
        for p in planes:
            x = p
            for _ in range(NOP):
                x = x + p
            out.append(x)
        return out

    def body_mul(planes):
        out = []
        for p in planes:
            x = p
            for _ in range(NOP):
                x = x * 1.0000001 + p
            out.append(x)
        return out

    def body_where(planes):
        m = planes[0] > 0.25
        out = []
        for p in planes:
            x = p
            for _ in range(NOP):
                x = jnp.where(m, x, p)
                x = x + p
            out.append(x)
        return out

    def body_rollx(planes):
        out = []
        for p in planes:
            x = p
            for _ in range(NOP):
                x = pltpu.roll(x, 1, axis=1)
            out.append(x + p)
        return out

    def body_rolly(planes):
        out = []
        for p in planes:
            x = p
            for _ in range(NOP):
                x = pltpu.roll(x, 1, axis=0)
            out.append(x + p)
        return out

    def body_concat(planes):
        out = []
        for p in planes:
            x = p
            for _ in range(NOP // 4):
                x = jnp.concatenate(
                    [x[:8], x[8:24] + p[8:24], x[24:W - 24],
                     x[W - 24:W - 8] + p[W - 24:W - 8], x[W - 8:]],
                    axis=0)
            out.append(x)
        return out

    base = time_call(make_call(body_noop))
    print(f"baseline (copy + 1 mul/plane): {base:.3f} ms/call")
    n_tot = NOP * n_planes
    for name, body, per in [
            ("add", body_add, n_tot),
            ("mul+add (fma)", body_mul, n_tot),
            ("where+add", body_where, n_tot),
            ("roll x (lane) by 1", body_rollx, n_tot),
            ("roll y (sublane) by 1", body_rolly, n_tot),
            ("5-piece row concat", body_concat, NOP // 4 * n_planes),
    ]:
        ms = time_call(make_call(body))
        print(f"{name}: {ms:.3f} ms/call -> "
              f"{(ms - base) / per * 1e3:.2f} us/plane-op "
              f"({(ms - base) / base * 100 / per:.1f}% of baseline each)")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*(args or [256, 10]))
