"""A/B the flagship kernel's temporal blocking depth on the real chip.

At T=4/R=256 the window overhead is 288/256 = 1.125 and the kernel is
compute-bound (copy-only DMA floor 0.083 ms/step << 0.27 ms/step), so a
shallower T=2/R=256 (overhead 272/256 = 1.0625) should win ~6% if the
per-block DMA (0.166 ms/step) stays hidden behind compute in the Pallas
grid pipeline.  Usage:
    python benchmarks/probe_tblock.py [--variant CSF|Perturbation] [T,R ...]
(default: 4,256 2,256).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(configs, variant="CSF"):
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
        beta=0.7, delta=0.98, tau_type=2, wetting_type=2, variant=variant,
        collision="MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float32)
    f_r0, f_b0 = model.init_state_layers(1.0, 1.0, invading_rows=100)

    for t_block, rows in configs:
        s0 = model.pack_state(f_r0, f_b0)  # fresh per config (donated)
        block = model.make_block_step(steps_per_call=t_block,
                                      rows_per_block=rows, compressed=True)
        if block is None:
            print(f"T={t_block} R={rows}: does not decompose")
            continue

        def steps(n_calls, s):
            def body(_, s):
                return block(s)
            return jax.lax.fori_loop(0, n_calls, body, s)

        run = jax.jit(steps, static_argnums=0, donate_argnums=1)
        n_steps = 600
        n_calls = n_steps // t_block
        s = run(n_calls, s0)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        s = run(n_calls, s)
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        mlups = ny * nx * (n_calls * t_block) / dt / 1e6
        print(f"{variant} T={t_block} R={rows}: {mlups:.0f} MLUPS "
              f"({dt / (n_calls * t_block) * 1e3:.3f} ms/step)", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    variant = "CSF"
    if args and args[0] == "--variant":
        variant = args[1]
        args = args[2:]
    if args:
        cfgs = [tuple(int(v) for v in a.split(",")) for a in args]
    else:
        cfgs = [(4, 256), (2, 256), (2, 128), (4, 128)]
    main(cfgs, variant)
