"""Chip probe: flagship CSF kernel with in-kernel sub-step rolling.

Usage: python benchmarks/probe_loop.py [T] [R] [UNROLL]
Measures wall-clock compile time and steady-state MLUPS for the
bench.py flagship config (1024^2 CSF MRT, compressed bf16 storage) at
temporal block T, rows-per-block R, and `substep_unroll` UNROLL
(0 = fully unrolled).  One TPU job at a time; run backgrounded with no
outer timeout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    t_block = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rpb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.colorgradient import (
        CGBoundaryConfig, ColorGradientParams, ColorGradientRK)

    ny = nx = 1024
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        tau_r=1.0, tau_b=1.0, surface_tension=0.1, contact_angle_deg=60.0,
        beta=0.7, delta=0.98, tau_type=2, wetting_type=2, variant="CSF",
        collision="MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float32)
    f_r, f_b = model.init_state_layers(1.0, 1.0, invading_rows=100)

    block = model.make_block_step(
        steps_per_call=t_block, rows_per_block=rpb, compressed=True,
        storage="bf16", substep_unroll=(unroll or None))
    assert block is not None, "kernel did not build"
    state = (model.pack_state_bf16(f_r, f_b),)

    def steps(n_calls, *s):
        def body(_, s):
            out = block(*s)
            return out if isinstance(out, tuple) else (out,)
        return jax.lax.fori_loop(0, n_calls, body, s)

    run = jax.jit(steps, static_argnums=0,
                  donate_argnums=tuple(range(1, 1 + len(state))))

    n_steps = 600
    n_calls = n_steps // t_block
    t0 = time.perf_counter()
    state = run(n_calls, *state)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    print(f"compile+first-run: {compile_s:.1f} s", flush=True)

    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        state = run(n_calls, *state)
        jax.block_until_ready(state)
        dt = min(dt, time.perf_counter() - t0)
    assert bool(jnp.isfinite(state[0]).all()), "non-finite state"

    mlups = ny * nx * n_steps / dt / 1e6
    print(f"T={t_block} R={rpb} unroll={unroll}: {mlups:.1f} MLUPS "
          f"(dt={dt * 1e3:.1f} ms / {n_steps} steps)", flush=True)


if __name__ == "__main__":
    main()
