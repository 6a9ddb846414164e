"""Ad-hoc: compressed vs split fused CSF kernel throughput on the real chip.

Usage: python benchmarks/bench_compressed.py [combos ...]
combo syntax: MODE,T,R  e.g. comp,4,64 split,4,64
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(combos):
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
                            dtype=jnp.float32, use_pallas=False)

    for combo in combos:
        # fresh state per combo: the timed run donates its buffers
        f_r, f_b = model.init_state_layers(1.0, 1.0, invading_rows=100)
        mode, t, r = combo.split(",")
        t, r = int(t), int(r)
        blk = model.make_block_step(steps_per_call=t, rows_per_block=r,
                                    compressed=(mode == "comp"))
        if blk is None:
            print(f"{combo}: does not decompose")
            continue
        if mode == "comp":
            state = (model.pack_state(f_r, f_b),)
        else:
            state = (f_r, f_b)

        def steps(n_calls, *s):
            def body(_, s):
                out = blk(*s)
                return out if isinstance(out, tuple) else (out,)
            return jax.lax.fori_loop(0, n_calls, body, s)

        run = jax.jit(steps, static_argnums=0,
                      donate_argnums=tuple(range(1, 1 + len(state))))
        n_steps = 600
        n_calls = n_steps // t
        out = run(n_calls, *state)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(n_calls, *out)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        mlups = ny * nx * (n_calls * t) / dt / 1e6
        fin = bool(jnp.isfinite(out[0]).all())
        print(f"{combo}: {mlups:.0f} MLUPS  ({dt / n_calls * 1e3:.3f} ms/call,"
              f" finite={fin})")


if __name__ == "__main__":
    main(sys.argv[1:] or ["split,4,64", "comp,4,64", "comp,4,128",
                          "comp,8,64"])
