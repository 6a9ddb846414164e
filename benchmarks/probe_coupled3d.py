"""Bench the fused coupled 3D CSF + D3Q7 transport kernel at n^3.

Usage: python benchmarks/probe_coupled3d.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n):
    import jax
    import jax.numpy as jnp

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.flow3d import (CG3DBoundaryConfig,
                                             ColorGradientParams3D,
                                             TransportRK3D)

    solid = np.zeros((n, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    fp = ColorGradientParams3D(surface_tension=0.01, tau_r=1.0, tau_b=0.8,
                               contact_angle_deg=60.0)
    m = TransportRK3D(geo.from_solid_mask(solid), fp, num_tracers=1,
                      tau=(1.0,), j0=(0.25,), interface_mode="bounceback",
                      dtype=jnp.float32)
    m.flow.bcs = CG3DBoundaryConfig(inlet="velocity", outlet="convective",
                                    inlet_velocity=-1e-3)
    fused = m.make_fused_step()
    if fused is None:
        print("does not decompose", flush=True)
        return
    fs = m.flow.init_state_layers(1.0, 1.0, invading_slabs=n // 8)
    conc0 = np.zeros((1, n, n, n))
    conc0[0, : n // 4] = 1.0
    st = m.init_state(fs, conc0)
    s = m.flow.pack_state(st[0], st[1])
    g = st[2]

    def steps(k, s, g):
        def body(_, sg):
            return fused(*sg)
        return jax.lax.fori_loop(0, k, body, (s, g))

    run = jax.jit(steps, static_argnums=0, donate_argnums=(1, 2))
    n_steps = 120
    s, g = run(n_steps, s, g)
    jax.block_until_ready(s)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s, g = run(n_steps, s, g)
        jax.block_until_ready(s)
        dt = min(dt, time.perf_counter() - t0)
    mlups = n ** 3 * n_steps / dt / 1e6
    fin = bool(np.isfinite(np.asarray(s)).all())
    print(f"coupled3d n={n}: {mlups:.0f} MLUPS (flow+tracer) finite={fin}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
