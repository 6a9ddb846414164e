"""Chip sweep of the flagship config: temporal block T x strip rows R.

Usage: python benchmarks/probe_flagship.py [T,R[,storage] ...]
Set PROBE_VARIANT=Perturbation for the RK-perturbation variant.
Prints one line per (T, R): compile status + MLUPS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.colorgradient import (
    CGBoundaryConfig, ColorGradientParams, ColorGradientRK)


def main():
    combos = [(4, 256, "f32"), (4, 512, "f32"), (8, 128, "f32"),
              (8, 256, "f32"), (6, 256, "f32")]
    if len(sys.argv) > 1:
        combos = []
        for a in sys.argv[1:]:
            parts = a.split(",")
            combos.append((int(parts[0]), int(parts[1]),
                           parts[2] if len(parts) > 2 else "f32"))

    ny = nx = 1024
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        tau_r=1.0, tau_b=1.0, surface_tension=0.1, contact_angle_deg=60.0,
        beta=0.7, delta=0.98, tau_type=2, wetting_type=2,
        variant=os.environ.get("PROBE_VARIANT", "CSF"),
        collision="MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float32)
    f_r, f_b = model.init_state_layers(1.0, 1.0, invading_rows=100)

    for t_block, rows, storage in combos:
        s0 = (model.pack_state_bf16(f_r, f_b) if storage == "bf16"
              else model.pack_state(f_r, f_b))
        try:
            block = model.make_block_step(steps_per_call=t_block,
                                          rows_per_block=rows,
                                          compressed=True, storage=storage)
            if block is None:
                print(f"T={t_block} R={rows} {storage}: no decomposition")
                continue

            def steps(n_calls, s):
                return jax.lax.fori_loop(0, n_calls, lambda _, x: block(x), s)

            run = jax.jit(steps, static_argnums=0, donate_argnums=1)
            n_steps = 600
            n_calls = max(1, n_steps // t_block)
            state = run(n_calls, s0.copy())
            jax.block_until_ready(state)
            dt = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                state = run(n_calls, state)
                jax.block_until_ready(state)
                dt = min(dt, time.perf_counter() - t0)
            mlups = ny * nx * (n_calls * t_block) / dt / 1e6
            ok = bool(jnp.isfinite(state).all())
            print(f"T={t_block} R={rows} {storage}: {mlups:.0f} MLUPS "
                  f"({dt / (n_calls * t_block) * 1e3:.3f} ms/step) finite={ok}",
                  flush=True)
        except Exception as e:  # VMEM overflow etc.
            msg = str(e).split("\n")[0][:160]
            print(f"T={t_block} R={rows} {storage}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
